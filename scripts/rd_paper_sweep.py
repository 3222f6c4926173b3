"""Paper-regime RD sweep: all four variants at the reference configs.

Reproduces the workflow behind the paper's Figs. 4-9 (BASELINE.md table;
reference src/plots.ipynb cells 17-42): for each variant x lambda, train at
the paper's architecture config (M=300 multi-task / disjoint 3x100 / shared
4x75; C=32 mixed, 42 disjoint+shared, 48 singles; batch 64; lambda in
{0.1, 0.01, 0.001}) on the 3-task set (rgb, depth_euclidean, normal) and
record an RD point: the training-geometry estimated bpp (what the paper's
W&B-exported curves plot), the corrected-geometry estimate, the ACTUAL
packed-bitstream bpp, and per-task PSNR / MS-SSIM / MSE*255^2.

Resumable: runs already present in the output JSON are skipped, so the
driver can be re-launched after an interruption.

    python scripts/rd_paper_sweep.py [--steps 2500] [--train-size 4096]
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

from mmnc_tpu import analysis
from mmnc_tpu.data import (SyntheticMultiTaskDataset, BatchLoader,
                           DeviceResidentDataset, prerender)
from mmnc_tpu.models import build_model
from mmnc_tpu.train.loop import fit

TASKS = ["rgb", "depth_euclidean", "normal"]
TASKS4 = TASKS + ["semantic"]
LMBDAS = [0.1, 0.01, 0.001]

# (run-kind, model number, tasks, M, C) — paper §IV-B configs, plus the
# semantic-bearing rows (paper evaluates bpp vs mIoU; reference assembles
# the 4-task set at src/train.py:243-253) so rate-vs-mIoU can be plotted
CONFIGS = (
    [("mixed", 2, TASKS, 300, 32),
     ("shared", 4, TASKS, 300, 42),
     ("disjoint", 3, TASKS, 300, 42)]
    + [(f"single-{t}", 1, [t], 100, 48) for t in TASKS]
    + [("shared4", 4, TASKS4, 300, 42),
       ("single-semantic", 1, ["semantic"], 100, 48)]
)


def parse_args(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2500)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--train-size", type=int, default=4096)
    p.add_argument("--val-size", type=int, default=256)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--steps-per-call", type=int, default=8)
    p.add_argument("--out", default="artifacts/rd_paper.json")
    p.add_argument("--run-dir", default="runs/rd_paper")
    p.add_argument("--only", default=None,
                   help="comma-separated run-kind filter (e.g. 'mixed,shared')")
    p.add_argument("--jobs", default=None,
                   help="explicit schedule: comma-separated kind:lmbda[:steps]"
                        " entries run IN ORDER (steps defaults to --steps). "
                        "Overrides --only/--lmbdas; lets one process (one "
                        "dataset load + HBM upload) drive a heterogeneous "
                        "round, e.g. 'mixed:0.1:50000,shared:0.01:12000'")
    p.add_argument("--lmbdas", default=None,
                   help="comma-separated lambda filter (default: all of "
                        f"{LMBDAS})")
    p.add_argument("--clip-norm", type=float, default=5.0,
                   help="global-norm gradient clip; generous enough to never "
                        "touch healthy steps, stops SGDR-restart blowups "
                        "(pass 0 to disable)")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint the loss (recompute forward in "
                        "backward) — fits shared4 batch 64 in v5e HBM")
    p.add_argument("--val-every-epochs", type=int, default=10)
    p.add_argument("--checkpoint-every-epochs", type=int, default=10)
    p.add_argument("--data-style", default="legacy",
                   choices=["legacy", "clevr"],
                   help="synthetic render style; 'clevr' matches the "
                        "reference data's statistics (fixed palette, "
                        "antialiased rgb — see DESIGN.md round 4). Use a "
                        "fresh --run-dir/--out when switching styles: runs "
                        "resume by name and the styles are different data")
    p.add_argument("--extend", action="store_true",
                   help="re-horizon the LR schedule when --steps exceeds a "
                        "finished run's horizon (warm-restart extension)")
    p.add_argument("--refresh", action="store_true",
                   help="recompute runs already present in --out")
    return p.parse_args(argv)


def task_loaders(dev_train, dev_val, tasks, batch_size):
    # task-subset VIEWS over the one HBM-resident cache — no copies per run
    return (BatchLoader(dev_train.subset_tasks(tasks), batch_size,
                        shuffle=True),
            BatchLoader(dev_val.subset_tasks(tasks), batch_size,
                        shuffle=False))


def rd_eval(model, state, val_loader):
    """Final RD point: real packed-bitstream bpp + both estimates + per-task
    metrics on one val batch (check_bpp semantics)."""
    variables = {"params": state.params}  # stay on device (D2H is slow here)
    batch = jax.tree.map(jnp.asarray, next(iter(val_loader.epoch(0))))
    tables = model.update_bottleneck_values(variables)
    bpp = analysis.check_bpp(model, variables, tables, batch)

    x_hats, _ = model.forward(variables, batch, training=False)
    point = dict(bpp)
    for t in model.tasks:
        if t == "semantic":
            # 17-logit head -> label map; the paper's semantic RD metric is
            # mIoU (BASELINE.md north-star "bpp vs PSNR/mIoU")
            from mmnc_tpu.ops.metrics import miou
            pred = jnp.argmax(x_hats[t], axis=-1)
            point[f"{t}/miou"] = float(miou(pred, batch[t][..., 0]))
            continue
        mse255 = float(jnp.mean(
            (x_hats[t] - batch[t]) ** 2)) * 255.0 ** 2
        point[f"{t}/mse255"] = mse255
        point[f"{t}/psnr"] = 10 * np.log10(255.0 ** 2 / max(mse255, 1e-12))
    return point


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])
    os.makedirs(os.path.dirname(args.out), exist_ok=True)

    done = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            done = {p["run"]: p for p in json.load(f)}

    only = set(args.only.split(",")) if args.only else None
    lmbdas = ([float(x) for x in args.lmbdas.split(",")]
              if args.lmbdas else LMBDAS)
    cfg_by_kind = {c[0]: c for c in CONFIGS}
    if args.jobs:
        schedule = []
        for spec in args.jobs.split(","):
            parts = spec.split(":")
            cfg = cfg_by_kind[parts[0]]
            lmbda = float(parts[1])
            steps = int(parts[2]) if len(parts) > 2 else args.steps
            # optional trailing fields: h<steps> (LR horizon beyond this
            # job's stop point), b<batch> (per-job batch size), remat
            opts = {}
            for tok in parts[3:]:
                if tok == "remat":
                    opts["remat"] = True
                elif tok.startswith("h"):
                    opts["horizon"] = int(tok[1:])
                elif tok.startswith("b"):
                    opts["batch"] = int(tok[1:])
                else:
                    raise ValueError(f"unknown job option {tok!r} in {spec!r}")
            schedule.append((cfg, lmbda, steps, opts))
        only = {cfg[0] for cfg, _, _, _ in schedule}
    else:
        schedule = [(cfg, lmbda, args.steps, {}) for cfg in CONFIGS
                    if only is None or cfg[0] in only
                    for lmbda in lmbdas]
    # prerender/upload only the tasks the SELECTED configs touch — the
    # HBM-resident cache is the big tenant (4-task uint16 train+val
    # ~4.6 GB), and a semantic-only slot (single-semantic) doesn't need
    # the 3-task arrays at all (saves both the multi-GB np.load on this
    # 1-vCPU box and the upload)
    tasks_needed = sorted(
        {t for kind, _, tasks, _, _ in CONFIGS
         if only is None or kind in only for t in tasks})
    need_semantic = "semantic" in tasks_needed
    need_base = any(t != "semantic" for t in tasks_needed)

    print(f"prerendering dataset ... (tasks: {','.join(tasks_needed)})")
    style = args.data_style
    train_arrays, val_arrays = {}, {}
    if need_base:
        # always prerender the full 3-task set (cache key identity with
        # earlier rounds), then keep only what the selected configs use
        full_train = prerender(SyntheticMultiTaskDataset(
            TASKS, size=args.train_size, image_size=args.image_size, seed=0,
            style=style), "data/prerendered")
        full_val = prerender(SyntheticMultiTaskDataset(
            TASKS, size=args.val_size, image_size=args.image_size,
            seed=10 ** 6, style=style), "data/prerendered")
        train_arrays = {t: a for t, a in full_train.arrays.items()
                        if t in tasks_needed}
        val_arrays = {t: a for t, a in full_val.arrays.items()
                      if t in tasks_needed}
        del full_train, full_val
    if need_semantic:
        # semantic rides a separate 1-task prerender (same seed => identical
        # scenes, the renderer derives every modality from one per-index rng)
        # so the big 3-task cache from earlier rounds stays a cache hit
        sem_train = prerender(SyntheticMultiTaskDataset(
            ["semantic"], size=args.train_size, image_size=args.image_size,
            seed=0, style=style), "data/prerendered")
        sem_val = prerender(SyntheticMultiTaskDataset(
            ["semantic"], size=args.val_size, image_size=args.image_size,
            seed=10 ** 6, style=style), "data/prerendered")
        train_arrays["semantic"] = sem_train.arrays["semantic"]
        val_arrays["semantic"] = sem_val.arrays["semantic"]
        del sem_train, sem_val
    # one HBM-resident uint16 cache shared by every run: the host on this
    # box needs ~2.5 s per fancy-indexed batch vs ~124 ms per train step,
    # so batches must be gathered on-device (see data/device_cache.py)
    print("uploading dataset to device HBM ...")
    t0 = time.time()
    dev_train = DeviceResidentDataset(train_arrays)
    dev_val = DeviceResidentDataset(val_arrays)
    del train_arrays, val_arrays
    print(f"  uploaded in {time.time() - t0:.0f}s")

    points = list(done.values())
    for (kind, model_num, tasks, m_lat, conv), lmbda, job_steps, job_opts \
            in schedule:
            run = f"{kind}-l{lmbda:g}"
            if run in done and not args.refresh:
                print(f"skip {run} (already in {args.out})")
                continue
            if (run in done and args.refresh
                    and int(done[run].get("steps") or 0) >= job_steps
                    and "rd_eval_error" not in done[run]):
                # refresh relaunch after an interruption: this job already
                # reached its step target and carries a clean eval — skip
                print(f"skip {run} (already at {done[run]['steps']} "
                      f">= {job_steps} steps)")
                continue
            t0 = time.time()
            model = build_model(model_num, tasks, latent_channels=m_lat,
                                conv_channels=conv, lmbda=lmbda,
                                learning_rate_main=args.lr,
                                learning_rate_aux=1e-3)
            job_batch = job_opts.get("batch") or args.batch_size
            job_remat = bool(job_opts.get("remat", args.remat))
            train_loader, val_loader = task_loaders(
                dev_train, dev_val, tasks, job_batch)
            epochs = job_steps // len(train_loader) + 1
            # big decoders (C=42 disjoint/shared upsample stacks) need the
            # smaller in-flight superbatch to stay inside HBM
            spc = min(args.steps_per_call, 4 if conv > 32 else 8)
            print(f"=== {run}: {model.get_model_name()} M={model.latent_channels} "
                  f"C={conv} lmbda={lmbda}")
            try:
                state, val_logs = fit(
                    model, train_loader, val_loader,
                    epochs=epochs, run_name=run, out_dir=args.run_dir,
                    resume=True, compute_metrics=True, train_metrics=False,
                    log_images=False, max_steps=job_steps,
                    steps_per_call=spc, log_every=50,
                    val_every_epochs=args.val_every_epochs,
                    extend_schedule=args.extend,
                    checkpoint_every_epochs=args.checkpoint_every_epochs,
                    clip_norm=args.clip_norm or None,
                    remat=job_remat,
                    schedule_total_steps=job_opts.get("horizon"))
            except Exception as e:  # noqa: BLE001 — skip, keep sweeping
                print(f"!!! {run} failed: {type(e).__name__}: {e}")
                if run in done:
                    # tag the surviving pre-refresh point so downstream
                    # plots can tell it from a fresh result (round-2 advisor)
                    done[run]["stale"] = True
                    done[run]["refresh_error"] = f"{type(e).__name__}: {e}"
                    points = list(done.values())
                    with open(args.out, "w") as f:
                        json.dump(points, f, indent=2)
                continue

            point = {"run": run, "kind": kind, "model": model_num,
                     "lmbda": lmbda, "tasks": list(tasks),
                     "data_style": args.data_style,
                     "batch_size": job_batch,
                     "remat": job_remat,
                     "steps": int(state.step),
                     "estimated_bpp_train_geometry": None,
                     "wallclock_s": round(time.time() - t0, 1)}
            point.update({k.replace("val/", ""): v
                          for k, v in val_logs.items()})
            point["estimated_bpp_train_geometry"] = val_logs.get(
                "val/compression_loss")
            try:
                point.update(rd_eval(model, state, val_loader))
            except Exception as e:  # noqa: BLE001 — keep the training point
                print(f"!!! {run} rd_eval failed: {type(e).__name__}: {e}")
                point["rd_eval_error"] = f"{type(e).__name__}: {e}"
            del state
            done[run] = point
            points = list(done.values())  # replaces the old point on refresh
            with open(args.out, "w") as f:
                json.dump(points, f, indent=2)
            print(f"  -> {json.dumps({k: v for k, v in point.items() if 'loss' not in k}, default=float)[:400]}")

    print(f"wrote {args.out} with {len(points)} points")


if __name__ == "__main__":
    main()
