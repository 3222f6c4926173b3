"""Hyperprior latent sparsity at low rate (plots.ipynb cells 48-50 parity).

The reference observes that at lambda=0.001 ~94% of the z-latent's
likelihoods are ~1 (i.e. ~0 bits). This reproduces that measurement on a
trained sweep checkpoint: the fraction of z (and y) likelihood entries
above 1 - eps on a val batch, plus the per-channel bpp attribution with
task-slice boundaries (BASELINE.md sparsity row).

    python scripts/latent_sparsity.py [--ckpt <dir>] [--eps 0.01]
"""

import argparse
import glob
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def latest_ckpt(run_dir):
    steps = sorted(glob.glob(os.path.join(run_dir, "checkpoints", "step_*")),
                   key=lambda p: int(p.rsplit("_", 1)[1]))
    return steps[-1] if steps else None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint dir (default: latest mixed-l0.001 run)")
    ap.add_argument("--eps", type=float, default=0.01)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--out", default="artifacts/latent_sparsity.json")
    args = ap.parse_args(argv)

    ckpt = args.ckpt or latest_ckpt("runs/rd_paper/mixed-l0.001")
    assert ckpt, "no checkpoint found"

    from mmnc_tpu import analysis
    from mmnc_tpu.data import SyntheticMultiTaskDataset, BatchLoader
    from mmnc_tpu.utils.checkpoint import (rebuild_model_from_checkpoint,
                                           restore_checkpoint)
    from mmnc_tpu.train.state import create_train_state

    model, hp = rebuild_model_from_checkpoint(ckpt)
    variables = model.init(jax.random.PRNGKey(0), model.example_batch())
    state = create_train_state(variables["params"], 1)
    payload, _ = restore_checkpoint(ckpt, state)
    variables = {"params": payload["params"]}

    ds = SyntheticMultiTaskDataset(model.tasks, size=args.batch_size,
                                   image_size=256, seed=10 ** 6)
    batch = jax.tree.map(jnp.asarray,
                         next(iter(BatchLoader(ds, args.batch_size,
                                               shuffle=False))))
    _, lik = model.forward(variables, batch, training=False)
    report = {"checkpoint": ckpt, "lmbda": hp.get("lmbda"),
              "eps": args.eps}
    for name in ("y", "z"):
        v = np.asarray(lik[name])
        report[f"{name}_frac_likelihood_near_1"] = float(
            (v > 1.0 - args.eps).mean())
        report[f"{name}_mean_bits"] = float(-np.log2(v).mean())
    cb = analysis.channel_bpp(model, variables, batch)
    report["z_channels_near_zero_bpp"] = int((cb["z"] < 1e-3).sum())
    report["z_channels_total"] = int(cb["z"].size)
    report["y_channels_near_zero_bpp"] = int((cb["y"] < 1e-3).sum())
    report["y_channels_total"] = int(cb["y"].size)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
