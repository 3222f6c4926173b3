"""Measure DP scaling on the simulated CPU mesh (VERDICT r2 #5).

Runs the fused train step at a fixed GLOBAL batch over 1/2/4/8 virtual
devices and records per-device-count step times to
artifacts/multichip_scaling.json. On the CPU simulator the absolute times
mean little (one host executes all "devices"), but the artifact proves the
sharded program compiles and executes at every mesh size and records the
collective overhead trend; on a real slice the same script measures true
scaling (the mesh/sharding code is device-agnostic, parallel/mesh.py).

    python scripts/multichip_scaling.py [--devices 1,2,4,8] [--batch 16]
"""

import argparse
import json
import os
import sys
import time

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from mmnc_tpu.data import SyntheticMultiTaskDataset
from mmnc_tpu.models import build_model
from mmnc_tpu.parallel import make_mesh, shard_batch, shard_train_state
from mmnc_tpu.train import create_train_state, make_train_step


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--devices", default="1,2,4,8")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--out", default="artifacts/multichip_scaling.json")
    args = p.parse_args(argv)

    counts = [int(x) for x in args.devices.split(",")]
    assert max(counts) <= len(jax.devices()), jax.devices()

    model = build_model(1, ["mono"], latent_channels=8, conv_channels=4,
                        lmbda=1e-2, learning_rate_main=1e-3)
    ds = SyntheticMultiTaskDataset(["mono"], size=args.batch, image_size=256,
                                   seed=0)
    import jax.numpy as jnp
    batch = {"mono": jnp.asarray(
        np.stack([ds[i]["mono"] for i in range(args.batch)]))}
    variables = model.init(jax.random.PRNGKey(0), batch)

    rows = []
    for n in counts:
        step = make_train_step(model, compute_metrics=False, donate=False)
        state = create_train_state(variables["params"], total_steps=100,
                                   learning_rate_main=1e-3)
        if n > 1:
            mesh = make_mesh(n)
            state = shard_train_state(state, mesh)
            b = shard_batch(batch, mesh)
        else:
            b = batch
        rng = jax.random.PRNGKey(1)
        state, logs = step(state, b, rng)  # compile
        jax.block_until_ready(logs)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, logs = step(state, b, rng)
        jax.block_until_ready(logs)
        dt = (time.perf_counter() - t0) / args.iters
        loss = float(logs["train/loss"])
        rows.append({"n_devices": n, "global_batch": args.batch,
                     "step_ms": round(dt * 1e3, 2),
                     "loss": round(loss, 6)})
        print(rows[-1])

    # the sharded loss must agree across mesh sizes (same global batch)
    losses = [r["loss"] for r in rows]
    spread = max(losses) - min(losses)
    out = {"platform": "cpu-simulated mesh",
           "note": "fixed global batch; loss invariance across mesh sizes "
                   "is the correctness signal, step_ms the overhead trend",
           "loss_spread": spread, "rows": rows}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out} (loss spread {spread:.2e})")
    assert spread < 1e-3 * max(abs(losses[0]), 1.0), losses


if __name__ == "__main__":
    main()
