"""Overfit probe: can the paper-config model drive distortion down at all?

Trains the mixed codec (M=300, C=32, 3 tasks — paper §IV-B) on ONE fixed
batch for a few thousand steps and prints the PSNR trajectory. If PSNR
climbs well past the ~20 dB plateau seen in the 10k-step RD runs, the
plateau is training budget, not architecture — green light for the long
runs. Also times the fused train step at several batch sizes to pick the
wall-clock-optimal training config (MXU utilization headroom check).

    python scripts/probe_overfit.py [--steps 3000] [--lr 1e-4]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mmnc_tpu.data import SyntheticMultiTaskDataset
from mmnc_tpu.models import build_model
from mmnc_tpu.train.state import create_train_state
from mmnc_tpu.train.step import make_multi_train_step

TASKS = ["rgb", "depth_euclidean", "normal"]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--horizon", type=int, default=None,
                   help="cosine-decay horizon (default: --steps; pass a "
                        "large value to hold LR near peak for the probe)")
    p.add_argument("--lmbda", type=float, default=0.1)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--steps-per-call", type=int, default=8)
    p.add_argument("--time-batches", default="64,128,256",
                   help="comma list of batch sizes to time (empty to skip)")
    p.add_argument("--y-gain", type=float, default=1.0,
                   help="multiply g_a's final conv kernel+bias by this at "
                        "init: larger-magnitude y = more quantization "
                        "levels available from step 0 (rate-warmup probe)")
    p.add_argument("--out", default=None,
                   help="write the PSNR/y-stat trajectory as JSON here")
    p.add_argument("--data-style", default="legacy",
                   choices=["legacy", "clevr"])
    args = p.parse_args(argv)

    ds = SyntheticMultiTaskDataset(TASKS, size=args.batch_size,
                                   image_size=256, seed=0,
                                   style=args.data_style)
    host_batch = {t: np.stack([ds[i][t] for i in range(args.batch_size)])
                  for t in TASKS}
    batch = {t: jnp.asarray(v) for t, v in host_batch.items()}

    model = build_model(2, TASKS, latent_channels=300, conv_channels=32,
                        lmbda=args.lmbda, learning_rate_main=args.lr,
                        learning_rate_aux=1e-3)
    rng = jax.random.PRNGKey(21)
    variables = model.init(rng, batch)
    if args.y_gain != 1.0:
        params = variables["params"]
        ga = dict(params["compressor"]["g_a"])
        last = sorted(k for k in ga if k.startswith("Conv_"))[-1]
        ga[last] = jax.tree.map(lambda x: x * args.y_gain, ga[last])
        comp = dict(params["compressor"]); comp["g_a"] = ga
        variables = {**variables,
                     "params": {**params, "compressor": comp}}
        print(f"  y-gain: scaled compressor/g_a/{last} by {args.y_gain}")
    state = create_train_state(variables["params"],
                               args.horizon or args.steps,
                               learning_rate_main=args.lr,
                               learning_rate_aux=1e-3)

    y_stats_fn = jax.jit(lambda p, b: model.encode_eval({"params": p}, b)[0])

    def y_stats(params):
        y = y_stats_fn(params, batch)
        ay = jnp.abs(y)
        return (float(jnp.std(y)), float(jnp.max(ay)),
                float(jnp.mean(ay > 0.5)))

    spc = args.steps_per_call
    step_fn = make_multi_train_step(model, spc, compute_metrics=True)
    super_batch = {t: jnp.broadcast_to(v[None], (spc,) + v.shape)
                   for t, v in batch.items()}

    print(f"probe: mixed M=300 C=32 lmbda={args.lmbda} lr={args.lr} "
          f"batch={args.batch_size} steps={args.steps}")
    t0 = time.time()
    state, logs = step_fn(state, super_batch, rng)
    jax.block_until_ready(logs)
    print(f"  compile+first-call: {time.time() - t0:.0f}s")

    hist = []
    t0 = time.time()
    done = spc
    while done < args.steps:
        state, logs = step_fn(state, super_batch, rng)
        done += spc
        if done % 256 < spc or done + spc >= args.steps:
            logs = jax.tree.map(float, jax.device_get(logs))
            dt = time.time() - t0
            row = {"step": done,
                   "steps_per_s": round(done / max(dt, 1e-9), 2),
                   "rgb_psnr": round(logs.get("train/rgb/psnr", 0), 2),
                   "depth_psnr": round(
                       logs.get("train/depth_euclidean/psnr", 0), 2),
                   "normal_psnr": round(logs.get("train/normal/psnr", 0), 2),
                   "rate_bpp": round(logs.get("train/compression_loss",
                                              logs.get("train/rate", 0)), 5),
                   "loss": round(logs.get("train/loss", 0), 3)}
            ystd, ymax, ylive = y_stats(state.params)
            row["y_std"] = round(ystd, 3)
            row["y_max"] = round(ymax, 2)
            row["y_live_frac"] = round(ylive, 4)
            hist.append(row)
            print("  " + " ".join(f"{k}={v}" for k, v in row.items()),
                  flush=True)

    if args.out:
        import json
        cfg = {"tasks": TASKS, "model": "mixed", "M": 300, "C": 32,
               "data_style": args.data_style,
               "lmbda": args.lmbda, "lr": args.lr, "y_gain": args.y_gain,
               "batch_size": args.batch_size, "steps": args.steps,
               "horizon": args.horizon or args.steps,
               "note": "one fixed synthetic batch, overfit trajectory"}
        with open(args.out, "w") as f:
            json.dump({"config": cfg, "history": hist}, f, indent=1)
        print(f"wrote {args.out}")

    if args.time_batches:
        print("step-time vs batch size (fresh state each, 3 timed calls):")
        for bs in [int(x) for x in args.time_batches.split(",") if x]:
            dsb = SyntheticMultiTaskDataset(TASKS, size=bs, image_size=256,
                                           seed=1)
            b = {t: jnp.asarray(np.stack([dsb[i][t] for i in range(bs)]))
                 for t in TASKS}
            sb = {t: jnp.broadcast_to(v[None], (spc,) + v.shape)
                  for t, v in b.items()}
            v2 = model.init(rng, b)
            st = create_train_state(v2["params"], 1000,
                                    learning_rate_main=args.lr)
            fn = make_multi_train_step(model, spc, compute_metrics=False)
            try:
                st, lg = fn(st, sb, rng)
                jax.block_until_ready(lg)
                t0 = time.time()
                n = 3
                for _ in range(n):
                    st, lg = fn(st, sb, rng)
                jax.block_until_ready(lg)
                per_step = (time.time() - t0) / (n * spc)
                print(f"  batch={bs}: {per_step * 1e3:.1f} ms/step, "
                      f"{bs / per_step:.0f} samples/s")
            except Exception as e:  # noqa: BLE001 — OOM probe
                print(f"  batch={bs}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
