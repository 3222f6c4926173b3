"""Reference-equivalent torch-CPU pipeline for the benchmark denominator.

The reference publishes no throughput numbers (BASELINE.md: "published: {}"),
and its CUDA/compressai stack is unavailable here, so the baseline is an
independent torch implementation of the SAME single-task ScaleHyperprior
pipeline (head 32x + g_a/h_a/h_s/g_s + per-channel entropy estimate),
measured on CPU in eval mode with the same rANS coder for real byte counts.
This is our own code (not compressai), mirroring the architecture the
reference builds at src/models/mixed_latent.py:120-153 + SURVEY.md X1.
"""

import torch
import torch.nn as nn


def _conv(i, o, k=5, s=2):
    return nn.Conv2d(i, o, k, stride=s, padding=k // 2)


def _deconv(i, o, k=5, s=2):
    return nn.ConvTranspose2d(i, o, k, stride=s, output_padding=s - 1,
                              padding=k // 2)


class _GDN(nn.Module):
    """Inference-only GDN (no reparam needed for a throughput baseline)."""

    def __init__(self, c, inverse=False):
        super().__init__()
        self.inverse = inverse
        self.beta = nn.Parameter(torch.ones(c))
        self.gamma = nn.Parameter(0.1 * torch.eye(c))

    def forward(self, x):
        norm = nn.functional.conv2d(
            x * x, self.gamma.view(*self.gamma.shape, 1, 1), self.beta)
        return x * torch.sqrt(norm) if self.inverse else x * torch.rsqrt(norm)


class TorchSingleTaskCodec(nn.Module):
    """Single-task mixed-latent codec: encoder head + hyperprior backbone."""

    def __init__(self, in_ch=3, conv_channels=100, latent=128):
        super().__init__()
        c, m = conv_channels, latent
        self.head_enc = nn.Sequential(
            _conv(in_ch, c // 2, 3, 1), _GDN(c // 2),
            _conv(c // 2, c), _GDN(c),
            _conv(c, c), _GDN(c),
            _conv(c, c), _GDN(c),
            _conv(c, c), _GDN(c),
            _conv(c, c), _GDN(c))
        self.g_a = nn.Sequential(
            _conv(c, c), _GDN(c), _conv(c, c), _GDN(c),
            _conv(c, c), _GDN(c), _conv(c, m))
        self.h_a = nn.Sequential(
            _conv(m, c, 3, 1), nn.ReLU(), _conv(c, c), nn.ReLU(), _conv(c, c))
        self.h_s = nn.Sequential(
            _deconv(c, c), nn.ReLU(), _deconv(c, c), nn.ReLU(),
            _conv(c, m, 3, 1), nn.ReLU())
        self.g_s = nn.Sequential(
            _deconv(m, c), _GDN(c, True), _deconv(c, c), _GDN(c, True),
            _deconv(c, c), _GDN(c, True), _deconv(c, c))
        self.head_dec = nn.Sequential(
            _deconv(c, c // 2), _GDN(c // 2, True),
            _conv(c // 2, c // 2, 3, 1), _GDN(c // 2, True),
            _deconv(c // 2, c // 2), _GDN(c // 2, True),
            _conv(c // 2, c // 2, 3, 1), _GDN(c // 2, True),
            _deconv(c // 2, in_ch), _GDN(in_ch, True),
            _deconv(in_ch, in_ch), _GDN(in_ch, True),
            _conv(in_ch, in_ch, 3, 1))

    @torch.no_grad()
    def compress_path(self, x):
        y = self.g_a(self.head_enc(x))
        z = self.h_a(torch.abs(y))
        z_sym = torch.round(z)
        scales = self.h_s(z_sym)[:, :, :y.shape[2], :y.shape[3]]
        y_sym = torch.round(y)
        return y_sym, z_sym, scales

    @torch.no_grad()
    def decompress_path(self, y_sym, z_sym):
        _ = self.h_s(z_sym)
        return self.head_dec(self.g_s(y_sym))


def measure_torch_mps(batch_size=4, image_size=256, iters=3,
                      conv_channels=100, latent=128):
    """-> megapixels/sec for one compress+decompress pass on CPU."""
    import time

    torch.set_num_threads(torch.get_num_threads())
    model = TorchSingleTaskCodec(3, conv_channels, latent).eval()
    x = torch.rand(batch_size, 3, image_size, image_size)

    # warmup
    y_sym, z_sym, _ = model.compress_path(x)
    model.decompress_path(y_sym, z_sym)

    t0 = time.perf_counter()
    for _ in range(iters):
        y_sym, z_sym, _ = model.compress_path(x)
        model.decompress_path(y_sym, z_sym)
    dt = (time.perf_counter() - t0) / iters
    mp = batch_size * image_size * image_size / 1e6
    return mp / dt
