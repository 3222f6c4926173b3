"""MS-SSIM golden oracle: independent torch implementation of the
pytorch_msssim.ms_ssim formula (the reference's metric, SURVEY.md X9,
multi_task_compressor.py:15-16,92) compared against ops.metrics.ms_ssim at
multiple image sizes, including a full 5-scale case and an odd size that
exercises the avg_pool padding path."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from mmnc_tpu.ops import metrics as M

WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _win(size=11, sigma=1.5):
    coords = torch.arange(size, dtype=torch.float32) - (size - 1) / 2.0
    g = torch.exp(-(coords ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def _filt(x, w):
    c = x.shape[1]
    x = F.conv2d(x, w.view(1, 1, -1, 1).repeat(c, 1, 1, 1), groups=c)
    return F.conv2d(x, w.view(1, 1, 1, -1).repeat(c, 1, 1, 1), groups=c)


def _ssim_pc(x, y, data_range, w, k1=0.01, k2=0.03):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu1, mu2 = _filt(x, w), _filt(y, w)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filt(x * x, w) - mu1_sq
    s2 = _filt(y * y, w) - mu2_sq
    s12 = _filt(x * y, w) - mu1_mu2
    cs_map = (2 * s12 + c2) / (s1 + s2 + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return ssim_map.mean([2, 3]), cs_map.mean([2, 3])


def torch_ms_ssim(x, y, data_range, weights=WEIGHTS):
    """pytorch_msssim.ms_ssim formula, implemented from its definition."""
    w = _win()
    mcs = []
    for i in range(len(weights)):
        ssim_pc, cs_pc = _ssim_pc(x, y, data_range, w)
        if i < len(weights) - 1:
            mcs.append(F.relu(cs_pc))
            pad = [s % 2 for s in x.shape[2:]]
            x = F.avg_pool2d(x, kernel_size=2, padding=pad)
            y = F.avg_pool2d(y, kernel_size=2, padding=pad)
    stack = torch.stack(mcs + [F.relu(ssim_pc)])  # (levels, B, C)
    wts = torch.tensor(weights, dtype=torch.float32).view(-1, 1, 1)
    return (stack ** wts).prod(dim=0).mean()


@pytest.mark.parametrize("shape,data_range", [
    ((2, 256, 256, 3), 255.0),   # full 5-scale case, multi-channel
    ((1, 183, 183, 1), 1.0),     # odd dims -> avg_pool pad path
    ((2, 176, 176, 3), 255.0),   # 176 -> 88 -> 44 -> 22 -> 11 (min size)
])
def test_ms_ssim_matches_torch_oracle(shape, data_range):
    rng = np.random.default_rng(42)
    base = rng.random(shape, dtype=np.float32) * data_range
    noisy = np.clip(
        base + rng.normal(0, 0.08 * data_range, shape), 0, data_range
    ).astype(np.float32)

    ours = float(M.ms_ssim(jnp.asarray(base), jnp.asarray(noisy), data_range))
    ref = float(torch_ms_ssim(
        torch.from_numpy(base.transpose(0, 3, 1, 2)),
        torch.from_numpy(noisy.transpose(0, 3, 1, 2)), data_range))
    assert ours == pytest.approx(ref, rel=1e-4), (ours, ref)


def test_ms_ssim_identity_is_one():
    x = jnp.asarray(np.random.default_rng(0).random((1, 176, 176, 3),
                                                    dtype=np.float32))
    assert float(M.ms_ssim(x, x, 1.0)) == pytest.approx(1.0, abs=1e-5)
