"""Reference-equivalent torch-CPU pipeline for the benchmark denominator.

The reference publishes no throughput numbers (BASELINE.md: "published: {}"),
and its CUDA/compressai stack is unavailable here, so the baseline is an
independent torch implementation of the SAME single-task ScaleHyperprior
pipeline (head 32x + g_a/h_a/h_s/g_s), measured on CPU in eval mode. This is
our own code (not compressai), mirroring the architecture the reference
builds at src/models/mixed_latent.py:120-153 + SURVEY.md X1.

What the measured path contains — stated so the bench JSON's denominator is
honest: the full compress+decompress NN compute, plus (like the reference's
compress()/decompress(), multi_task_compressor.py:507-549) REAL rANS
encode+decode of the y and z symbols through the same native coder this
framework uses (native/rans/rans.cpp), with Gaussian scale-table indexes.
The hardware is this box's 1-vCPU torch — a lower bound on what the
reference would do on a GPU; the bench JSON labels it as such.
"""

import numpy as np
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


def _rans_roundtrip(y_sym, z_sym, scales, gc_table, scale_table):
    """Real range-coding of the quantized latents (per batch item, like the
    reference's per-image strings) with the framework's native coder."""
    from mmnc_tpu.entropy import rans

    y = y_sym.numpy().astype(np.int32)
    z = z_sym.numpy().astype(np.int32)
    s = np.maximum(scales.numpy(), 0.11)
    indexes = np.searchsorted(scale_table[:-1], s).astype(np.int32)
    # z has no learned EB here; code it against the widest Gaussian row
    z_idx = np.full(z[0].size, len(scale_table) - 1, np.int32)
    n_bytes = 0
    for i in range(y.shape[0]):
        ys = rans.encode_with_indexes(y[i].ravel(), indexes[i].ravel(),
                                      gc_table)
        zs = rans.encode_with_indexes(z[i].ravel(), z_idx, gc_table)
        n_bytes += len(ys) + len(zs)
        rans.decode_with_indexes(ys, indexes[i].ravel(), gc_table)
        rans.decode_with_indexes(zs, z_idx, gc_table)
    return n_bytes


def measure_torch_mps(batch_size=4, image_size=256, iters=3,
                      conv_channels=100, latent=128):
    """-> megapixels/sec for one compress+decompress pass on CPU, including
    real rANS encode+decode of y and z (see module docstring)."""
    import time

    from mmnc_tpu.entropy.gaussian_conditional import get_scale_table
    from mmnc_tpu.entropy.tables import build_gc_table

    torch.set_num_threads(torch.get_num_threads())
    model = TorchSingleTaskCodec(3, conv_channels, latent).eval()
    x = torch.rand(batch_size, 3, image_size, image_size)
    gc_table = build_gc_table()
    scale_table = np.asarray(get_scale_table())

    def one_pass():
        y_sym, z_sym, scales = model.compress_path(x)
        _rans_roundtrip(y_sym, z_sym, scales, gc_table, scale_table)
        model.decompress_path(y_sym, z_sym)

    one_pass()  # warmup

    t0 = time.perf_counter()
    for _ in range(iters):
        one_pass()
    dt = (time.perf_counter() - t0) / iters
    mp = batch_size * image_size * image_size / 1e6
    return mp / dt
