"""Per-layer wall-time attribution of the compress program (bench config).

The streaming profile shows A_compress_device ≈ 128 ms (f32, batch 512) —
roughly 8x the conv-flops roofline of this chain on a v5e — so something
non-obvious dominates (layout pads? GDN? dispatch?). This times each stage
of g_a/h_a as its own jitted program, f32 and bf16, to name the cost.

    python scripts/measure_compress_breakdown.py [--batch-size 512]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, iters=6):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--conv-channels", type=int, default=100)
    ap.add_argument("--latent", type=int, default=128)
    ap.add_argument("--out", default="artifacts/compress_breakdown.json")
    args = ap.parse_args(argv)

    from mmnc_tpu.ops.layers import Conv, GDN

    report = {"batch_size": args.batch_size, "device": str(jax.devices()[0])}
    rng = np.random.default_rng(0)

    for dtype_name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        n = args.conv_channels
        stages = []
        h, c_in = args.image_size, 3
        for i, feat in enumerate([n, n, n, args.latent]):
            stages.append((f"conv{i}_k5s2_{h}px_{c_in}to{feat}",
                           Conv(features=feat, dtype=dtype), (h, c_in)))
            h //= 2
            c_in = feat
            if i < 3:
                stages.append((f"gdn{i}_{h}px_{c_in}", GDN(dtype=dtype),
                               (h, c_in)))

        per = {}
        for name, mod, (hh, cc) in stages:
            x = jnp.asarray(rng.random(
                (args.batch_size, hh, hh, cc), np.float32), dtype)
            v = mod.init(jax.random.PRNGKey(0), x)
            f = jax.jit(lambda v, x, mod=mod: mod.apply(v, x))
            per[name] = timed(f, v, x)
        report[dtype_name] = {k: round(v * 1e3, 3) for k, v in per.items()}
        report[f"{dtype_name}_sum_ms"] = round(sum(per.values()) * 1e3, 2)

        # the whole fused chain as ONE program, for fusion-gain comparison
        from mmnc_tpu.models import build_model
        model = build_model(1, ["rgb"], latent_channels=args.latent,
                            conv_channels=args.conv_channels, lmbda=1e-2,
                            dtype=dtype)
        batch = {"rgb": jnp.asarray(rng.random(
            (args.batch_size, args.image_size, args.image_size, 3),
            np.float32))}
        variables = model.init(jax.random.PRNGKey(0), batch)
        report[f"{dtype_name}_fused_compress_ms"] = round(timed(
            lambda v, b: jax.block_until_ready(
                model._compress_device_lean(v, b)), variables, batch) * 1e3, 2)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
