"""Image quality metrics in JAX: PSNR and MS-SSIM.

Parity targets (SURVEY.md X9, used by the reference at
src/models/multi_task_compressor.py:15-16,92,359-384):
* PSNR — torchmetrics peak_signal_noise_ratio semantics with explicit
  data_range: one global MSE over the whole batch.
* MS-SSIM — pytorch_msssim.ms_ssim semantics: 5 scales, weights
  (0.0448, 0.2856, 0.3001, 0.2363, 0.1333), 11x11 Gaussian window
  sigma 1.5, K1=0.01, K2=0.03, VALID-padded depthwise filtering,
  2x2 average-pool (floor) downsampling between scales, cs/ssim relu'd.
"""

import jax
import jax.numpy as jnp

MS_SSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(pred, target, data_range: float):
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def miou(pred_labels, target_labels, num_classes: int = 17):
    """Mean intersection-over-union over classes present in the target.

    pred/target: integer label maps (any shape). The paper reports bpp vs
    mIoU for the semantic task (BASELINE.md); the reference never computes
    it in code — added here for full RD reporting.
    """
    pred = pred_labels.astype(jnp.int32).ravel()
    tgt = target_labels.astype(jnp.int32).ravel()
    ious = []
    present = []
    for c in range(num_classes):
        p = pred == c
        t = tgt == c
        inter = jnp.sum(p & t)
        union = jnp.sum(p | t)
        ious.append(inter / jnp.maximum(union, 1))
        present.append(jnp.any(t))
    ious = jnp.stack(ious)
    present = jnp.stack(present).astype(jnp.float32)
    return jnp.sum(ious * present) / jnp.maximum(jnp.sum(present), 1.0)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / jnp.sum(g)


def _filter2d_depthwise(x, win1d):
    """Separable VALID Gaussian filtering per channel; x NHWC."""
    c = x.shape[-1]
    kh = win1d.reshape(-1, 1, 1, 1) * jnp.ones((1, 1, 1, c))
    kw = win1d.reshape(1, -1, 1, 1) * jnp.ones((1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST)
    return x


def _ssim_components(x, y, data_range, win1d, k1=0.01, k2=0.03):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = _filter2d_depthwise(x, win1d)
    mu_y = _filter2d_depthwise(y, win1d)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = _filter2d_depthwise(x * x, win1d) - mu_xx
    sigma_yy = _filter2d_depthwise(y * y, win1d) - mu_yy
    sigma_xy = _filter2d_depthwise(x * y, win1d) - mu_xy
    cs = (2 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ssim = ((2 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs
    # per-channel means (B, C): pytorch_msssim keeps channels separate
    # through the multi-scale product and averages only at the very end
    return jnp.mean(ssim, axis=(1, 2)), jnp.mean(cs, axis=(1, 2))


def ssim(pred, target, data_range: float, win_size: int = 11,
         win_sigma: float = 1.5):
    win = _gaussian_kernel(win_size, win_sigma)
    s, _ = _ssim_components(pred, target, data_range, win)
    return jnp.mean(s)


def _avg_pool2(x):
    """2x2/2 average pool with torch avg_pool2d(kernel_size=2, padding=s%2)
    semantics — the exact downsampler pytorch_msssim uses between scales:
    odd dims are zero-padded on BOTH sides (symmetric), zeros counted."""
    _, h, w, _ = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0


def ms_ssim(pred, target, data_range: float, win_size: int = 11,
            win_sigma: float = 1.5, weights=MS_SSIM_WEIGHTS):
    """Multi-scale SSIM averaged over batch and channels; pred/target NHWC.

    Exact pytorch_msssim.ms_ssim semantics: per-channel ssim/cs means at
    each scale, relu, weighted product across scales per channel, then one
    mean over (batch, channel)."""
    win = _gaussian_kernel(win_size, win_sigma)
    levels = len(weights)
    weights = jnp.asarray(weights, jnp.float32)
    mcs = []
    x, y = pred, target
    for i in range(levels):
        s, cs = _ssim_components(x, y, data_range, win)
        if i < levels - 1:
            mcs.append(jax.nn.relu(cs))
            x = _avg_pool2(x)
            y = _avg_pool2(y)
    s = jax.nn.relu(s)
    stack = jnp.stack(mcs + [s])  # (levels, B, C)
    val = jnp.prod(stack ** weights[:, None, None], axis=0)
    return jnp.mean(val)
