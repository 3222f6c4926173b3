"""Loss accounting and metric tests (reference formulas from SURVEY.md §2.4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmnc_tpu.models import losses as L
from mmnc_tpu.ops import metrics as M


def test_mse_loss_is_mse_times_hw():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 8, 8, 3)).astype(np.float32)
    xh = rng.normal(size=(4, 8, 8, 3)).astype(np.float32)
    got = float(L.reconstruction_loss(jnp.asarray(xh), jnp.asarray(x), "mse"))
    want = np.mean((x - xh) ** 2) * 8 * 8  # MSE * H * W
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_l1_loss():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 4, 4, 2)).astype(np.float32)
    xh = rng.normal(size=(2, 4, 4, 2)).astype(np.float32)
    got = float(L.reconstruction_loss(jnp.asarray(xh), jnp.asarray(x), "l1"))
    want = np.abs(x - xh).sum(axis=(1, 2, 3)).mean() / 2
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cross_entropy_loss():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(2, 4, 4, 17)).astype(np.float32)
    labels = rng.integers(0, 17, size=(2, 4, 4, 1)).astype(np.float32)
    got = float(L.reconstruction_loss(
        jnp.asarray(logits), jnp.asarray(labels), "cross-entropy"))
    # manual softmax CE
    e = np.exp(logits - logits.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    lab = labels[..., 0].astype(int)
    want = -np.mean(np.log(
        np.take_along_axis(p, lab[..., None], axis=-1)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_uncertainty_weighting_zeroes_dropped_tasks():
    log_vars = jnp.asarray([0.5, -0.3, 0.0])
    task_losses = {"a": jnp.float32(2.0), "b": jnp.float32(0.0),
                   "c": jnp.float32(1.0)}
    got = float(L.uncertainty_weighted_sum(task_losses, log_vars))
    want = (np.exp(-0.5) * 2.0 + 0.5) + 0.0 + (np.exp(0.0) * 1.0 + 0.0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_bits_per_pixel():
    lik = jnp.full((1, 2, 2, 4), 0.5)
    # 16 values at 1 bit each over 4 pixels -> 4 bpp
    np.testing.assert_allclose(float(L.bits_per_pixel(lik, 4)), 4.0, rtol=1e-6)


def _fake(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(0.2, 1.0, shape).astype(np.float32))


def test_rate_formula_relationships():
    """mixed/disjoint/shared formulas agree with hand-computed numpy."""
    tasks = ("t0", "t1")
    y = _fake((2, 4, 4, 8), 3)
    z = _fake((2, 1, 1, 4), 4)
    x_hats = {t: jnp.zeros((2, 16, 16, 3)) for t in tasks}
    lik = {"y": y, "z": z}
    n_pix = 2 * 16 * 16

    bpp = lambda a: -np.sum(np.log2(np.asarray(a))) / n_pix

    mixed, mlogs = L.compression_loss_mixed(lik, x_hats, tasks)
    np.testing.assert_allclose(float(mixed), (bpp(y) + bpp(z)) / 2, rtol=1e-5)
    np.testing.assert_allclose(float(mlogs["t0/compression_loss"]),
                               bpp(y) + bpp(z), rtol=1e-5)

    disj, dlogs = L.compression_loss_disjoint(lik, x_hats, tasks, 4)
    want = (bpp(y[..., :4]) + bpp(y[..., 4:]) + bpp(z)) / 2
    np.testing.assert_allclose(float(disj), want, rtol=1e-5)
    np.testing.assert_allclose(float(dlogs["t1/compression_loss"]),
                               bpp(y[..., 4:]) + bpp(z), rtol=1e-5)

    # shared splits 8 channels as 2 tasks x 2ch + shared 2ch (pretend cpt=2)
    shr, slogs = L.compression_loss_shared(lik, x_hats, tasks, 2)
    want = (bpp(y[..., :2]) + bpp(y[..., 2:4]) + bpp(z)) / 2 \
        + bpp(y[..., -2:]) / 2
    np.testing.assert_allclose(float(shr), want, rtol=1e-5)
    np.testing.assert_allclose(float(slogs["shared/compression_loss"]),
                               bpp(y[..., -2:]) + bpp(z), rtol=1e-5)


def test_psnr():
    x = jnp.zeros((1, 4, 4, 1))
    y = jnp.full((1, 4, 4, 1), 10.0)
    got = float(M.psnr(y, x, data_range=255))
    want = 10 * np.log10(255 ** 2 / 100.0)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ssim_identity_and_degradation():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    assert float(M.ssim(x, x, 255)) == pytest.approx(1.0, abs=1e-5)
    noisy1 = x + 5.0 * jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    noisy2 = x + 25.0 * jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    s1 = float(M.ssim(noisy1, x, 255))
    s2 = float(M.ssim(noisy2, x, 255))
    assert 1 > s1 > s2 > 0


def test_ssim_matches_independent_numpy():
    """Single-scale SSIM vs a direct scipy implementation (Wang et al.)."""
    from scipy.ndimage import correlate1d
    rng = np.random.default_rng(6)
    x = rng.uniform(0, 1, (32, 32)).astype(np.float64)
    y = (x + 0.1 * rng.normal(size=x.shape)).astype(np.float64)

    g = np.exp(-((np.arange(11) - 5.0) ** 2) / (2 * 1.5 ** 2))
    g /= g.sum()

    def filt(a):
        a = correlate1d(a, g, axis=0)
        a = correlate1d(a, g, axis=1)
        return a[5:-5, 5:-5]

    c1, c2 = (0.01 * 1) ** 2, (0.03 * 1) ** 2
    mx, my = filt(x), filt(y)
    sxx = filt(x * x) - mx * mx
    syy = filt(y * y) - my * my
    sxy = filt(x * y) - mx * my
    want = np.mean(((2 * mx * my + c1) * (2 * sxy + c2))
                   / ((mx ** 2 + my ** 2 + c1) * (sxx + syy + c2)))

    got = float(M.ssim(jnp.asarray(y[None, :, :, None], jnp.float32),
                       jnp.asarray(x[None, :, :, None], jnp.float32), 1.0))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_ms_ssim_identity_and_range():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(0, 255, (2, 192, 192, 3)).astype(np.float32))
    assert float(M.ms_ssim(x, x, 255)) == pytest.approx(1.0, abs=1e-4)
    noisy = x + 20 * jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    v = float(M.ms_ssim(noisy, x, 255))
    assert 0 < v < 1
