"""Re-evaluate every sweep checkpoint over the FULL val set.

The sweep's inline rd_eval scores one 64-image batch; at ~0.1 dB PSNR
separations that sampling noise can flip curve ordering. This script
rebuilds each run's latest checkpoint and recomputes the RD point over the
whole val split (metrics averaged over all batches; actual packed-bitstream
bpp from real rANS coding of the full split), writing
artifacts/rd_paper_eval.json for scripts/rd_plots.py.

    python scripts/rd_reeval.py [--run-dir runs/rd_paper]
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
import jax
import jax.numpy as jnp


def latest_ckpt(run_dir, at_step=None):
    """Latest checkpoint, or with `at_step` the one closest to that step —
    checkpoints accumulate every N epochs, so a fixed-budget comparison
    across families (they train to different final steps) stays possible."""
    steps = sorted(glob.glob(os.path.join(run_dir, "checkpoints", "step_*")),
                   key=lambda p: int(p.rsplit("_", 1)[1]))
    if not steps:
        return None, 0
    if at_step is not None:
        best = min(steps, key=lambda p: abs(int(p.rsplit("_", 1)[1])
                                            - at_step))
        return best, int(best.rsplit("_", 1)[1])
    return steps[-1], int(steps[-1].rsplit("_", 1)[1])


def _eval_run(model, variables, tables, dev_val, batch_size,
              M, jnp, np, BatchLoader):
    """Full-val RD point for one rebuilt run at `batch_size`."""
    loader = BatchLoader(dev_val.subset_tasks(list(model.tasks)),
                         batch_size, shuffle=False)
    point = {"n_images": len(loader) * batch_size,
             "eval_batch_size": batch_size}
    total_bytes = 0
    n_pix = 0
    acc = {}
    for batch in loader.epoch(0):
        batch = {t: jnp.asarray(v) for t, v in batch.items()}
        _, n_bytes = model.compress(variables, tables, batch)
        b, h, w, _ = batch[model.tasks[0]].shape
        total_bytes += n_bytes
        n_pix += b * h * w
        x_hats, lik = model.forward(variables, batch, training=False)
        est, _ = model._compression_loss(lik, batch)
        twin = model.corrected_geometry_twin()
        _, lik_c = twin.forward(variables, batch, training=False)
        est_c, _ = twin._compression_loss(lik_c, batch)
        acc.setdefault("est_legacy", []).append(float(est))
        acc.setdefault("est_corrected", []).append(float(est_c))
        for t in model.tasks:
            if t == "semantic":
                # paper metric is rate vs mIoU (BASELINE.md); the
                # reference also logs argmaxed PSNR at data_range 17
                # (multi_task_compressor.py:359-384)
                pred = jnp.argmax(x_hats[t], axis=-1)
                acc.setdefault(f"{t}/miou", []).append(
                    float(M.miou(pred, batch[t][..., 0])))
                acc.setdefault(f"{t}/psnr", []).append(float(M.psnr(
                    pred[..., None].astype(jnp.float32), batch[t], 17.0)))
                continue
            mse255 = float(jnp.mean((x_hats[t] - batch[t]) ** 2)) * 255.0 ** 2
            acc.setdefault(f"{t}/mse255", []).append(mse255)
            acc.setdefault(f"{t}/psnr", []).append(
                float(M.psnr(x_hats[t] * 255.0, batch[t] * 255.0, 255.0)))
            acc.setdefault(f"{t}/ms-ssim", []).append(
                float(M.ms_ssim(x_hats[t] * 255.0, batch[t] * 255.0,
                                255.0)))
    point["actual_bpp"] = total_bytes * 8 / (n_pix * model.n_tasks)
    point["estimated_bpp_legacy"] = float(np.mean(acc.pop("est_legacy")))
    point["estimated_bpp"] = float(np.mean(acc.pop("est_corrected")))
    for k, v in acc.items():
        point[k] = float(np.mean(v))
    return point


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", default="runs/rd_paper")
    ap.add_argument("--val-size", type=int, default=256)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--out", default="artifacts/rd_paper_eval.json")
    ap.add_argument("--at-step", type=int, default=None,
                    help="evaluate the checkpoint closest to this step "
                         "instead of the latest (budget-matched ranking "
                         "across families that trained to different steps)")
    ap.add_argument("--data-style", default="legacy",
                    choices=["legacy", "clevr"],
                    help="must match the style the runs were trained on")
    ap.add_argument("--platform", default=None, choices=["cpu"],
                    help="force the JAX platform — the axon TPU plugin "
                         "ignores JAX_PLATFORMS, so this is the tunnel-"
                         "outage fallback (slow but correct)")
    ap.add_argument("--only", default=None,
                    help="comma-separated run-name filter (e.g. "
                         "'mixed-l0.1,shared-l0.1') — lets a degraded "
                         "(CPU) eval cover the highest-value runs first")
    args = ap.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from mmnc_tpu import analysis
    from mmnc_tpu.data import (SyntheticMultiTaskDataset, BatchLoader,
                               DeviceResidentDataset, prerender)
    from mmnc_tpu.ops import metrics as M
    from mmnc_tpu.utils.checkpoint import (rebuild_model_from_checkpoint,
                                           restore_checkpoint)
    from mmnc_tpu.train.state import create_train_state

    full_val = prerender(SyntheticMultiTaskDataset(
        ["rgb", "depth_euclidean", "normal"], size=args.val_size,
        image_size=256, seed=10 ** 6, style=args.data_style),
        "data/prerendered")
    # semantic rides its own 1-task prerender (same seed => same scenes)
    # so the 3-task cache from earlier rounds stays valid
    sem_val = prerender(SyntheticMultiTaskDataset(
        ["semantic"], size=args.val_size, image_size=256, seed=10 ** 6,
        style=args.data_style), "data/prerendered")
    dev_val = DeviceResidentDataset(
        {**full_val.arrays, "semantic": sem_val.arrays["semantic"]})
    del full_val, sem_val

    only = set(args.only.split(",")) if args.only else None
    # resume: a rerun (the close-out watchdog re-invokes after the drive)
    # keeps points whose checkpoint step is unchanged instead of paying the
    # full compress+forward eval again
    existing = {}
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                existing = {p["run"]: p for p in json.load(f)}
        except (json.JSONDecodeError, KeyError):
            existing = {}
    # every write MERGES over the prior artifact: runs outside --only, or
    # whose run dir vanished (the documented VM-reset scenario), keep their
    # cached points instead of being silently dropped (round-4 advisor)
    by_run = dict(existing)
    visited = set()

    def _write():
        with open(args.out, "w") as f:
            json.dump(sorted(by_run.values(), key=lambda p: p["run"]),
                      f, indent=2)

    for run_dir in sorted(glob.glob(os.path.join(args.run_dir, "*"))):
        run = os.path.basename(run_dir)
        if only is not None and run not in only:
            continue
        ckpt, step = latest_ckpt(run_dir, args.at_step)
        if ckpt is None:
            continue
        visited.add(run)
        prev = existing.get(run)
        if (prev is not None and prev.get("steps") == step
                and prev.get("data_style") == args.data_style
                and prev.get("n_images") == args.val_size
                and "error" not in prev):
            # n_images is part of cache validity (protocol, not just
            # checkpoint identity); a differing batch size only changes
            # per-batch stream packing, so note it but keep the point
            if prev.get("eval_batch_size") != args.batch_size:
                print(f"{run}: cached point used eval_batch_size "
                      f"{prev.get('eval_batch_size')} (requested "
                      f"{args.batch_size})")
            print(f"{run}: step {step} cached (unchanged checkpoint)")
            continue
        t0 = time.time()
        model, hp = rebuild_model_from_checkpoint(ckpt)
        variables = model.init(jax.random.PRNGKey(0), model.example_batch())
        state = create_train_state(variables["params"], 1)
        payload, _ = restore_checkpoint(ckpt, state)
        variables = {"params": payload["params"]}
        tables = model.update_bottleneck_values(variables)

        kind = (run.rsplit("-l", 1)[0])
        # one run's failure must not abort the rest of the sweep (a 4-task
        # model can OOM where the others fit; a tunnel hiccup can kill one
        # compress call) — retry OOM-shaped failures down a batch ladder,
        # record anything else and move on. Matches bench.py's OOM matcher.
        OOM_MARKS = ("RESOURCE_EXHAUSTED", "Resource exhausted",
                     "out of memory", "OOM")
        point = None
        err = None
        bs = args.batch_size
        while bs >= 8:
            try:
                point = _eval_run(model, variables, tables, dev_val, bs,
                                  M, jnp, np, BatchLoader)
                break
            except Exception as e:  # noqa: BLE001 — per-run isolation
                err = e
                if any(m in str(e) for m in OOM_MARKS):
                    print(f"{run}: batch {bs} OOM — retrying at {bs // 2}")
                    bs //= 2
                    continue
                break
        if point is None:
            print(f"{run}: FAILED ({type(err).__name__}: {str(err)[:120]})")
            by_run[run] = {"run": run, "kind": kind, "steps": step,
                           "data_style": args.data_style,
                           "error": f"{type(err).__name__}: {str(err)[:300]}"}
            _write()
            continue
        point.update({"run": run, "kind": kind, "lmbda": hp.get("lmbda"),
                      "steps": step, "tasks": list(model.tasks),
                      "checkpoint": os.path.relpath(ckpt),
                      "data_style": args.data_style})
        by_run[run] = point
        print(f"{run}: step {step} bpp {point['actual_bpp']:.4f} "
              f"(legacy est {point['estimated_bpp_legacy']:.4f}) "
              f"[{time.time() - t0:.0f}s]")
        _write()
    _write()  # all-cached reruns still rewrite
    kept = len(by_run) - len(visited)
    print(f"wrote {args.out} with {len(by_run)} points "
          f"({len(visited)} visited, {kept} kept from prior artifact)")


if __name__ == "__main__":
    main()
