"""Unit tests for core ops: conv/deconv torch-geometry parity, GDN, bounds.

torch (CPU) is used as an independent oracle for the conv geometry the
reference relies on (compressai conv/deconv helpers, SURVEY.md X7) and for
GDN math (SURVEY.md X6).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from mmnc_tpu.ops import layers
from mmnc_tpu.ops.bound import lower_bound
from mmnc_tpu.ops.quant import quantize_noise, quantize_round, quantize_ste


def _nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


@pytest.mark.parametrize("k,s,hw", [(5, 2, 16), (3, 1, 16), (5, 2, 17), (5, 2, 1)])
def test_conv_matches_torch(k, s, hw):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, hw, hw, 3)).astype(np.float32)
    w = rng.normal(size=(k, k, 3, 4)).astype(np.float32)

    y = layers.conv(jnp.asarray(x), jnp.asarray(w), stride=s)

    xt = torch.from_numpy(_nchw(x))
    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))
    yt = F.conv2d(xt, wt, stride=s, padding=k // 2)

    np.testing.assert_allclose(_nchw(y), yt.numpy(), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,s,hw", [(5, 2, 8), (5, 2, 1), (5, 2, 4), (3, 2, 8)])
def test_deconv_matches_torch(k, s, hw):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, hw, hw, 4)).astype(np.float32)
    w = rng.normal(size=(k, k, 4, 3)).astype(np.float32)

    y = layers.deconv(jnp.asarray(x), jnp.asarray(w), stride=s)

    xt = torch.from_numpy(_nchw(x))
    # torch ConvTranspose2d weight (Cin, Cout, k, k) computes the adjoint of
    # conv; our lhs-dilated cross-correlation equals it with a flipped kernel
    wt = torch.from_numpy(np.transpose(w[::-1, ::-1].copy(), (2, 3, 0, 1)))
    yt = F.conv_transpose2d(xt, wt, stride=s, padding=k // 2,
                            output_padding=s - 1)

    assert y.shape[1] == hw * s, "deconv must exactly upsample by stride"
    np.testing.assert_allclose(_nchw(y), yt.numpy(), rtol=1e-4, atol=1e-4)


def test_gdn_matches_reference_math():
    """GDN forward vs an independent torch implementation of
    y = x / sqrt(beta + x^2 conv gamma) with the sqrt reparam."""
    c = 6
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 4, 4, c)).astype(np.float32)

    mod = layers.GDN()
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = mod.apply(params, jnp.asarray(x))

    beta_r = np.asarray(params["params"]["beta"])
    gamma_r = np.asarray(params["params"]["gamma"])
    ped = layers._PEDESTAL
    beta = np.maximum(beta_r, (layers._BETA_MIN + ped) ** 0.5) ** 2 - ped
    gamma = np.maximum(gamma_r, ped ** 0.5) ** 2 - ped

    xt = torch.from_numpy(_nchw(x))
    wt = torch.from_numpy(gamma).reshape(c, c, 1, 1)
    norm = F.conv2d(xt * xt, wt, torch.from_numpy(beta))
    yt = xt * torch.rsqrt(norm)
    np.testing.assert_allclose(_nchw(y), yt.numpy(), rtol=1e-5, atol=1e-5)

    # inverse GDN multiplies
    mod_i = layers.GDN(inverse=True)
    yi = mod_i.apply(params, jnp.asarray(x))
    yti = xt * torch.sqrt(norm)
    np.testing.assert_allclose(_nchw(yi), yti.numpy(), rtol=1e-5, atol=1e-5)


def test_gdn_igdn_roundtrip_identity_at_init():
    """At init gamma=0.1*I, beta=1: IGDN(GDN(x)) should be ~x for small x."""
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 8, 8, 4)) * 0.1,
                    jnp.float32)
    gdn = layers.GDN()
    igdn = layers.GDN(inverse=True)
    p = gdn.init(jax.random.PRNGKey(0), x)
    y = gdn.apply(p, x)
    # same params: norm computed on y differs from norm on x, so only approx
    z = igdn.apply(p, y)
    assert jnp.max(jnp.abs(z - x)) < 0.05


def test_lower_bound_gradients():
    g_above = jax.grad(lambda v: lower_bound(v, 1.0))(2.0)
    g_below_out = jax.grad(lambda v: lower_bound(v, 1.0))(0.5)
    g_below_in = jax.grad(lambda v: -lower_bound(v, 1.0))(0.5)
    assert g_above == 1.0
    # below bound: gradient that would push the value further down is blocked
    assert g_below_out == 0.0
    # gradient pushing the value back up (toward feasible) passes through
    assert g_below_in == -1.0


def test_quantizers():
    key = jax.random.PRNGKey(0)
    x = jnp.linspace(-3, 3, 13)
    xn = quantize_noise(x, key)
    assert jnp.max(jnp.abs(xn - x)) <= 0.5

    medians = jnp.float32(0.3)
    xq = quantize_round(x, medians)
    np.testing.assert_allclose(np.asarray(xq - medians),
                               np.round(np.asarray(x - medians)), atol=1e-6)

    g = jax.grad(lambda v: jnp.sum(quantize_ste(v)))(x)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(x))


def test_conv_module_shapes():
    x = jnp.zeros((2, 32, 32, 3))
    m = layers.Conv(features=8)
    p = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(p, x).shape == (2, 16, 16, 8)

    d = layers.Deconv(features=3)
    pd = d.init(jax.random.PRNGKey(0), m.apply(p, x))
    assert d.apply(pd, m.apply(p, x)).shape == (2, 32, 32, 3)


@pytest.mark.parametrize("hw", [1, 2, 4, 7, 8, 16])
def test_deconv_phase_decomposition_matches_dilated(hw):
    """The dense 4-phase k5/s2 deconv (MXU-friendly lowering) must equal
    the dilated-conv form bit-for-float on every spatial size the codecs
    hit, including the saturated 1x1 latents and odd sizes."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, hw, hw, 6)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(5, 5, 6, 4)).astype(np.float32))
    ref = layers._deconv_dilated(x, w, stride=2)
    fast = layers._deconv_phase_k5s2(x, w)
    assert fast.shape == ref.shape == (2, 2 * hw, 2 * hw, 4)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("hw", [1, 2, 4, 7, 8, 16])
def test_deconv_phase_packed_matches_dilated(hw):
    """The single-conv packed-phase lowering (4*Cout channels +
    depth-to-space) must equal the dilated form on every spatial size the
    codecs hit, including the saturated 1x1 latents and odd sizes."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, hw, hw, 6)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(5, 5, 6, 4)).astype(np.float32))
    ref = layers._deconv_dilated(x, w, stride=2)
    fast = layers._deconv_phase_packed_k5s2(x, w)
    assert fast.shape == ref.shape == (2, 2 * hw, 2 * hw, 4)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_deconv_phase_packed_gradients_match_dilated():
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(5, 5, 3, 2)).astype(np.float32))
    g_ref = jax.grad(lambda a, b: jnp.sum(
        jnp.sin(layers._deconv_dilated(a, b))), argnums=(0, 1))(x, w)
    g_fast = jax.grad(lambda a, b: jnp.sum(
        jnp.sin(layers._deconv_phase_packed_k5s2(a, b))), argnums=(0, 1))(x, w)
    for a, b in zip(g_ref, g_fast):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("impl", ["dilated", "phase", "packed"])
def test_deconv_env_dispatch_equivalence(impl, monkeypatch):
    """deconv() must produce the same result whichever lowering the
    MMNC_DECONV_IMPL env selects (k5/s2 — the only codec shape)."""
    monkeypatch.setattr(layers, "_DECONV_IMPL", impl)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 6)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(5, 5, 6, 4)).astype(np.float32))
    ref = layers._deconv_dilated(x, w, stride=2)
    np.testing.assert_allclose(np.asarray(layers.deconv(x, w, stride=2)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)
    # non-k5 and non-s2 shapes must always take the dilated path
    w3 = jnp.asarray(rng.normal(size=(3, 3, 6, 4)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(layers.deconv(x, w3, stride=2)),
        np.asarray(layers._deconv_dilated(x, w3, stride=2)))


def test_deconv_phase_gradients_match_dilated():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(5, 5, 3, 2)).astype(np.float32))
    g_ref = jax.grad(lambda a, b: jnp.sum(
        jnp.sin(layers._deconv_dilated(a, b))), argnums=(0, 1))(x, w)
    g_fast = jax.grad(lambda a, b: jnp.sum(
        jnp.sin(layers._deconv_phase_k5s2(a, b))), argnums=(0, 1))(x, w)
    for a, b in zip(g_ref, g_fast):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_conv_s2d_matches_direct():
    """The space-to-depth k5/s2 lowering (_conv_s2d_k5s2) must match the
    plain strided conv on even inputs for small Cin (the input-head conv
    shapes), including odd Cout and Cin=1 (depth/semantic heads)."""
    rng = np.random.default_rng(11)
    for cin, cout, hw in [(3, 100, 16), (1, 7, 8), (4, 5, 32), (3, 3, 2)]:
        x = jnp.asarray(rng.normal(size=(2, hw, hw, cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(5, 5, cin, cout)).astype(np.float32))
        ref = layers.conv(x, w, stride=2)
        fast = layers._conv_s2d_k5s2(x, w)
        assert fast.shape == ref.shape
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_conv_s2d_env_dispatch(monkeypatch):
    """conv() takes the s2d path only when MMNC_CONV_S2D=s2d AND the shape
    qualifies (k5/s2, Cin <= 8, even H/W); everything else stays direct."""
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(5, 5, 3, 10)).astype(np.float32))
    direct = np.asarray(layers.conv(x, w, stride=2))

    monkeypatch.setattr(layers, "_CONV_S2D_IMPL", "s2d")
    np.testing.assert_allclose(np.asarray(layers.conv(x, w, stride=2)),
                               direct, rtol=1e-5, atol=1e-5)
    # wide Cin must NOT reroute (weights (5,5,100,?) stay on the MXU-happy
    # direct path), nor odd spatial, nor k3 — these fall through
    x_odd = jnp.asarray(rng.normal(size=(1, 17, 17, 3)).astype(np.float32))
    out_odd = layers.conv(x_odd, w, stride=2)
    monkeypatch.setattr(layers, "_CONV_S2D_IMPL", "direct")
    np.testing.assert_array_equal(np.asarray(out_odd),
                                  np.asarray(layers.conv(x_odd, w, stride=2)))


def test_conv_s2d_gradients_match_direct():
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(5, 5, 3, 4)).astype(np.float32))
    g_ref = jax.grad(lambda a, b: jnp.sum(
        jnp.sin(layers.conv(a, b, stride=2))), argnums=(0, 1))(x, w)
    g_fast = jax.grad(lambda a, b: jnp.sum(
        jnp.sin(layers._conv_s2d_k5s2(a, b))), argnums=(0, 1))(x, w)
    for a, b in zip(g_ref, g_fast):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
