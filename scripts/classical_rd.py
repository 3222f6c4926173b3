"""Classical-codec (JPEG/WebP) RD baseline on the shared eval set.

The reference's plots notebook opens with JPEG/WebP quality bisection and
its Fig. 4 overlays JPEG on the learned curves (src/plots.ipynb cells 1-3);
this renders the same baseline on OUR 256-image clevr-style val split so
the learned codecs and the classical ones share one axis in
rd_clevr_plots (scripts/rd_plots.py --classical).

Per task (rgb / normal as RGB; depth_euclidean as 8-bit grayscale — JPEG
and lossy WebP are 8-bit codecs, so the 16-bit depth contract quantizes
to 8 bits first, which is part of the classical codec's honest distortion),
sweep the quality knob and record the achieved bpp + PSNR + MS-SSIM
averaged over the split.

    python scripts/classical_rd.py [--out artifacts/classical_rd.json]
"""

import argparse
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

QUALITIES = [1, 2, 5, 10, 20, 35, 50, 70, 85, 95]
TASKS = ["rgb", "depth_euclidean", "normal"]


def encode_decode(img01: np.ndarray, codec: str, quality: int):
    """img01 (H,W,C) float [0,1] -> (decoded01, bits)."""
    from PIL import Image
    u8 = np.clip(img01 * 255.0, 0, 255).astype(np.uint8)
    mode = "L" if u8.shape[-1] == 1 else "RGB"
    pil = Image.fromarray(u8[..., 0] if mode == "L" else u8, mode)
    buf = io.BytesIO()
    pil.save(buf, format=codec, quality=quality)
    bits = buf.tell() * 8
    buf.seek(0)
    dec = np.asarray(Image.open(buf).convert(mode), np.float32) / 255.0
    if mode == "L":
        dec = dec[..., None]
    return dec, bits


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/classical_rd.json")
    ap.add_argument("--val-size", type=int, default=256)
    ap.add_argument("--data-style", default="clevr",
                    choices=["legacy", "clevr"])
    ap.add_argument("--no-ms-ssim", action="store_true",
                    help="skip MS-SSIM (needs jax; PSNR/bpp are numpy-only)")
    args = ap.parse_args(argv)

    from mmnc_tpu.data import SyntheticMultiTaskDataset, prerender
    val = prerender(SyntheticMultiTaskDataset(
        TASKS, size=args.val_size, image_size=256, seed=10 ** 6,
        style=args.data_style), "data/prerendered")

    ms_ssim = None
    if not args.no_ms_ssim:
        # this runs beside TPU jobs: force the CPU backend BEFORE any jax
        # device use (the axon plugin ignores the JAX_PLATFORMS env var)
        import jax
        jax.config.update("jax_platforms", "cpu")
        from mmnc_tpu.ops.metrics import ms_ssim as _ms
        import jax.numpy as jnp

        def ms_ssim(a, b):  # (N,H,W,C) in [0,1]
            return float(_ms(jnp.asarray(a) * 255.0, jnp.asarray(b) * 255.0,
                             255.0))

    points = []
    for codec in ("JPEG", "WEBP"):
        for task in TASKS:
            arr = val.arrays[task]  # (N,H,W,C) float32 [0,1]
            n, h, w, _ = arr.shape
            for q in QUALITIES:
                decs = np.empty_like(arr)
                total_bits = 0
                for i in range(n):
                    decs[i], bits = encode_decode(arr[i], codec, q)
                    total_bits += bits
                mse255 = float(np.mean((decs - arr) ** 2)) * 255.0 ** 2
                point = {
                    "codec": codec, "quality": q, "task": task,
                    "n_images": n, "data_style": args.data_style,
                    "bpp": total_bits / (n * h * w),
                    f"{task}/mse255": mse255,
                    f"{task}/psnr": 10 * np.log10(255.0 ** 2
                                                  / max(mse255, 1e-12)),
                }
                if ms_ssim is not None:
                    point[f"{task}/ms-ssim"] = ms_ssim(decs, arr)
                points.append(point)
                print(f"{codec} q={q:3d} {task}: bpp={point['bpp']:.4f} "
                      f"psnr={point[f'{task}/psnr']:.2f}")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(points, f, indent=2)
    print(f"wrote {args.out} with {len(points)} points")


if __name__ == "__main__":
    main()
