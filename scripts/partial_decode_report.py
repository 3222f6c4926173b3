"""Quantify the partial-decode win on TRAINED checkpoints.

The disjoint/shared variants exist so a receiver can decode one task from
a subset of the bitstream (the separable-latent rationale of the
reference's disjoint design, src/models/disjoint_latent.py:28-37 — which
the reference never exercises over real bitstreams). This measures, on a
trained checkpoint and real rANS streams:

* bytes needed to decode each task alone (its slice + shared slice for
  model 4 + the z hyperlatent) as a fraction of the full stream,
* the slicing overhead of per-slice streams vs the single packed stream,
* max |partial - full| reconstruction difference (the two synthesis
  paths are the same math modulo XLA fusion order; tests pin atol 1e-5).

    python scripts/partial_decode_report.py [--runs disjoint-l0.1,...]
"""

import argparse
import glob
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", default="runs/rd_clevr")
    ap.add_argument("--runs", default="disjoint-l0.1,shared-l0.1,shared4-l0.1")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--data-style", default="clevr",
                    choices=["legacy", "clevr"])
    ap.add_argument("--out", default="artifacts/partial_decode.json")
    ap.add_argument("--platform", default=None, choices=["cpu"],
                    help="force the CPU backend (run beside a TPU tenant)")
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from mmnc_tpu.data import SyntheticMultiTaskDataset, prerender
    from mmnc_tpu.train.state import create_train_state
    from mmnc_tpu.utils.checkpoint import (rebuild_model_from_checkpoint,
                                           restore_checkpoint)

    val3 = prerender(SyntheticMultiTaskDataset(
        ["rgb", "depth_euclidean", "normal"], size=256, image_size=256,
        seed=10 ** 6, style=args.data_style), "data/prerendered")
    semv = prerender(SyntheticMultiTaskDataset(
        ["semantic"], size=256, image_size=256, seed=10 ** 6,
        style=args.data_style), "data/prerendered")
    arrays = {**val3.arrays, "semantic": semv.arrays["semantic"]}

    report = {"batch_size": args.batch_size, "data_style": args.data_style,
              "device": str(jax.devices()[0]), "runs": {}}
    for run in args.runs.split(","):
        ckpts = sorted(
            glob.glob(os.path.join(args.run_dir, run, "checkpoints",
                                   "step_*")),
            key=lambda p: int(p.rsplit("_", 1)[1]))
        if not ckpts:
            print(f"{run}: no checkpoints, skipping")
            continue
        ckpt = ckpts[-1]
        t0 = time.time()
        model, hp = rebuild_model_from_checkpoint(ckpt)
        variables = model.init(jax.random.PRNGKey(0), model.example_batch())
        state = create_train_state(variables["params"], 1)
        payload, _ = restore_checkpoint(ckpt, state)
        variables = {"params": payload["params"]}
        tables = model.update_bottleneck_values(variables)
        batch = {t: jnp.asarray(arrays[t][:args.batch_size])
                 for t in model.tasks}

        full_ans, full_bytes = model.compress(variables, tables, batch)
        full = model.decompress(variables, tables, full_ans)
        part_ans, part_total = model.compress_partial(variables, tables,
                                                      batch)
        z_bytes = sum(len(s) for s in part_ans["z_strings"])
        shared_bytes = sum(
            len(s) for s in part_ans["task_streams"].get("shared", []))

        entry = {"checkpoint": os.path.relpath(ckpt),
                 "steps": int(ckpt.rsplit("_", 1)[1]),
                 "variant": model.variant, "tasks": list(model.tasks),
                 "full_stream_bytes": int(full_bytes),
                 "partial_capable_total_bytes": int(part_total),
                 "slicing_overhead": part_total / full_bytes - 1.0,
                 "z_bytes": z_bytes, "shared_slice_bytes": shared_bytes,
                 "per_task": {}}
        for task in model.tasks:
            t_bytes = sum(len(s) for s in part_ans["task_streams"][task])
            alone = t_bytes + shared_bytes + z_bytes
            rec = model.decompress_tasks(variables, tables, part_ans, [task])
            diff = float(jnp.max(jnp.abs(rec[task] - full[task])))
            entry["per_task"][task] = {
                "slice_bytes": t_bytes,
                "decode_alone_bytes": alone,
                "fraction_of_full_stream": alone / full_bytes,
                "fraction_of_partial_total": alone / part_total,
                "max_abs_diff_vs_full_decode": diff,
            }
            print(f"{run} {task}: alone {alone}B = "
                  f"{alone / full_bytes:.1%} of full {full_bytes}B "
                  f"(maxdiff {diff:.2e})")
        report["runs"][run] = entry
        print(f"{run}: done in {time.time() - t0:.0f}s")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
