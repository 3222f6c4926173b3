"""Torch-CPU oracle for the PSNR-plateau diagnosis (round 4).

The JAX pure-autoencoder probe (scripts/diag_backbone.py, mode `ae`)
crawls on a one-batch overfit (~19.5 dB after 1200 steps). To decide
whether that is an implementation defect in our JAX stack or intrinsic
to the architecture (1x1xM global latent + deep (I)GDN chains), this
script trains the SAME single-task architecture written independently in
torch — reference building blocks re-derived from their published
semantics (conv k5s2 p2 / deconv k5s2 p2 op1, compressai-style GDN with
sqrt-reparametrized non-negative params), torch default inits, Adam —
on the SAME synthetic batch (numpy generator, identical pixels).

Run the matched JAX curve with:
    python scripts/diag_backbone.py --modes ae --image-size 64 \
        --batch-size 16 --conv-channels 32 --latent-channels 128

If torch's curve matches JAX's (both crawl), the plateau is the
architecture/optimization regime, not our code.
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch
import torch.nn as nn

from mmnc_tpu.data import SyntheticMultiTaskDataset


# --- non-negative reparam (reference GDN semantics) ------------------------

_OFFSET = 2.0 ** -18
_PEDESTAL = _OFFSET ** 2


class _LowerBoundFn(torch.autograd.Function):
    @staticmethod
    def forward(ctx, x, bound):
        ctx.save_for_backward(x)
        ctx.bound = bound
        return torch.clamp_min(x, bound)

    @staticmethod
    def backward(ctx, g):
        (x,) = ctx.saved_tensors
        pass_through = (x >= ctx.bound) | (g < 0)
        return g * pass_through, None


def _nonneg_init(v):
    return torch.sqrt(torch.clamp_min(v + _PEDESTAL, _PEDESTAL))


def _nonneg(reparam, minimum=0.0):
    bound = (minimum + _OFFSET ** 2) ** 0.5
    out = _LowerBoundFn.apply(reparam, bound)
    return out * out - _PEDESTAL


class GDN(nn.Module):
    def __init__(self, ch, inverse=False):
        super().__init__()
        self.inverse = inverse
        self.beta = nn.Parameter(_nonneg_init(torch.ones(ch)))
        self.gamma = nn.Parameter(_nonneg_init(0.1 * torch.eye(ch)))

    def forward(self, x):
        beta = _nonneg(self.beta, 1e-6)
        gamma = _nonneg(self.gamma)
        c = x.shape[1]
        norm = nn.functional.conv2d(x * x, gamma.view(c, c, 1, 1), beta)
        if self.inverse:
            return x * torch.sqrt(norm)
        return x * torch.rsqrt(norm)


def conv(cin, cout, k=5, s=2):
    return nn.Conv2d(cin, cout, k, stride=s, padding=k // 2)


def deconv(cin, cout, k=5, s=2):
    return nn.ConvTranspose2d(cin, cout, k, stride=s,
                              output_padding=s - 1, padding=k // 2)


def encoder_head(cin, c):
    return nn.Sequential(
        conv(cin, c // 2, k=3, s=1), GDN(c // 2),
        conv(c // 2, c), GDN(c),
        conv(c, c), GDN(c),
        conv(c, c), GDN(c),
        conv(c, c), GDN(c),
        conv(c, c), GDN(c),
    )


def analysis(n, m):
    return nn.Sequential(
        conv(n, n), GDN(n),
        conv(n, n), GDN(n),
        conv(n, n), GDN(n),
        conv(n, m),
    )


def synthesis(m, n):
    return nn.Sequential(
        deconv(m, n), GDN(n, inverse=True),
        deconv(n, n), GDN(n, inverse=True),
        deconv(n, n), GDN(n, inverse=True),
        deconv(n, n),
    )


def decoder_head(cin, out):
    mid = cin // 2
    return nn.Sequential(
        deconv(cin, mid), GDN(mid, inverse=True),
        conv(mid, mid, k=3, s=1), GDN(mid, inverse=True),
        deconv(mid, mid), GDN(mid, inverse=True),
        conv(mid, mid, k=3, s=1), GDN(mid, inverse=True),
        deconv(mid, out), GDN(out, inverse=True),
        deconv(out, out), GDN(out, inverse=True),
        conv(out, out, k=3, s=1),
    )


class SingleTaskAE(nn.Module):
    """encode_head -> g_a -> (no quantization) -> g_s -> decode_head."""

    def __init__(self, c, m):
        super().__init__()
        self.enc = encoder_head(3, c)
        self.g_a = analysis(c, m)
        self.g_s = synthesis(m, c)
        self.dec = decoder_head(c, 3)

    def forward(self, x):
        y = self.g_a(self.enc(x))
        return self.dec(self.g_s(y)), y


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--image-size", type=int, default=64)
    p.add_argument("--conv-channels", type=int, default=32)
    p.add_argument("--latent-channels", type=int, default=128)
    p.add_argument("--log-every", type=int, default=128)
    p.add_argument("--threads", type=int, default=0)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    if args.threads:
        torch.set_num_threads(args.threads)
    torch.manual_seed(21)

    ds = SyntheticMultiTaskDataset(["rgb"], size=args.batch_size,
                                   image_size=args.image_size, seed=0)
    batch = np.stack([ds[i]["rgb"] for i in range(args.batch_size)])
    x = torch.from_numpy(batch).permute(0, 3, 1, 2).contiguous()  # NCHW

    model = SingleTaskAE(args.conv_channels, args.latent_channels)
    opt = torch.optim.Adam(model.parameters(), lr=args.lr)

    hist = []
    t0 = time.time()
    for i in range(1, args.steps + 1):
        xh, y = model(x)
        mse = torch.mean((x - xh) ** 2)
        loss = mse * 65536.0
        opt.zero_grad()
        loss.backward()
        opt.step()
        if i % args.log_every == 0 or i == args.steps:
            psnr = -10.0 * math.log10(max(float(mse), 1e-12))
            row = {"step": i, "loss": round(float(loss), 3),
                   "rgb_psnr": round(psnr, 2),
                   "y_std": round(float(y.detach().std()), 3)}
            hist.append(row)
            print("  [torch] " + " ".join(f"{k}={v}" for k, v in row.items()),
                  flush=True)
    print(f"  [torch] {args.steps} steps in {time.time() - t0:.0f}s")

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"config": vars(args), "results": {"torch_ae": hist}},
                      f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
