"""Render the paper-style RD figures + ordering check from the sweep output.

Consumes artifacts/rd_paper.json (written by scripts/rd_paper_sweep.py) and
produces, per task, bpp-vs-PSNR and bpp-vs-MSE*255^2 curves comparing the
four variants — the shape of the reference's Figs. 4/7/8/9
(src/plots.ipynb cells 17-42) — plus a machine-checkable summary:

* per-curve monotonicity (distortion must improve as bpp grows),
* the paper's average-over-tasks ordering Mixed > Shared >= Disjoint >
  Single at matched rates (compared via each variant's RD curve
  interpolated to the single-task models' achieved bpp).

    python scripts/rd_plots.py [--in artifacts/rd_paper.json]
                               [--out-dir artifacts/rd_paper_plots]
"""

import argparse
import json
import os
import sys

import numpy as np


KIND_ORDER = ["mixed", "shared", "disjoint", "single"]


def load_points(path):
    with open(path) as f:
        return json.load(f)


def curves_by_kind(points, task, bpp_key="actual_bpp"):
    """{kind: [(bpp, psnr, mse255), ...] sorted by bpp} for one task.

    The three per-task single models each contribute only their own task's
    curve (paper convention: "3x single" = one single-task model per task).
    """
    out = {}
    for p in points:
        if task not in p.get("tasks", []):
            continue
        if p.get("stale"):
            continue  # failed-refresh leftovers are tagged, not plotted
        kind = "single" if p["kind"].startswith("single-") else p["kind"]
        # semantic's distortion channel is mIoU (paper: bpp vs mIoU);
        # every other task's is MSE*255^2
        psnr = p.get(f"{task}/psnr")
        second = (p.get(f"{task}/miou") if task == "semantic"
                  else p.get(f"{task}/mse255"))
        if psnr is None or second is None or p.get(bpp_key) is None:
            continue
        out.setdefault(kind, []).append((p[bpp_key], psnr, second))
    return {k: sorted(v) for k, v in out.items()}


def monotone_fraction(curve):
    """Fraction of adjacent bpp-sorted pairs where PSNR is non-decreasing."""
    if len(curve) < 2:
        return 1.0
    ok = sum(1 for a, b in zip(curve, curve[1:]) if b[1] >= a[1] - 1e-6)
    return ok / (len(curve) - 1)


def interp_psnr(curve, bpp):
    """PSNR at `bpp` by linear interpolation, or None when `bpp` falls
    outside the curve's achieved bpp range — np.interp would clamp to the
    endpoint PSNR there, silently scoring a curve with extrapolated values
    and potentially flipping the ordering verdict (round-2 advisor)."""
    xs = np.array([c[0] for c in curve])
    ys = np.array([c[1] for c in curve])
    if bpp < xs.min() or bpp > xs.max():
        return None
    return float(np.interp(bpp, xs, ys))


def at_matched_lambda(points, tasks):
    """{lambda: {avg_psnr, ranking, ...}} comparing the four paper kinds at
    the same lambda, averaged over the tasks where EVERY kind has a point
    (restricting to common tasks keeps the average fair — singles cover one
    task each, and tasks differ in difficulty). bpps differ across kinds at
    a given lambda, so this is a proxy for the paper's matched-rate
    ordering, not a replacement."""
    ml = {}
    for p in points:
        if p.get("stale") or p.get("lmbda") is None:
            continue
        kind = "single" if p["kind"].startswith("single-") else p["kind"]
        if kind not in KIND_ORDER:
            continue
        for task in p.get("tasks", []):
            if task == "semantic" or task not in tasks:
                continue
            v = p.get(f"{task}/psnr")
            if v is not None:
                ml.setdefault(p["lmbda"], {}).setdefault(kind, {})[task] = v
    out = {}
    for lm, kinds in sorted(ml.items()):
        common = [t for t in tasks if t != "semantic"
                  and all(t in kinds.get(k, {}) for k in KIND_ORDER)]
        entry = {"kinds_present": [k for k in KIND_ORDER if k in kinds],
                 "tasks_compared": common}
        if common:
            avg = {k: float(np.mean([kinds[k][t] for t in common]))
                   for k in KIND_ORDER}
            ranked = sorted(avg, key=avg.get, reverse=True)
            entry["avg_psnr"] = avg
            entry["ranking"] = ranked
            entry["in_paper_order"] = (
                ranked == [k for k in KIND_ORDER if k in ranked])
        out[str(lm)] = entry
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="inp", default="artifacts/rd_paper.json")
    ap.add_argument("--out-dir", default="artifacts/rd_paper_plots")
    ap.add_argument("--bpp-key", default="actual_bpp",
                    choices=["actual_bpp", "estimated_bpp",
                             "estimated_bpp_legacy"])
    ap.add_argument("--baseline", default="artifacts/learned_baseline_rd.json",
                    help="learned-baseline overlay points (plots.ipynb "
                         "cell 5 analog); skipped if missing")
    ap.add_argument("--classical", default="artifacts/classical_rd.json",
                    help="JPEG/WebP quality-sweep points from "
                         "scripts/classical_rd.py (plots.ipynb cells 1-3 "
                         "analog; paper Fig. 4's JPEG curve); skipped if "
                         "missing")
    ap.add_argument("--min-steps", type=int, default=0,
                    help="drop runs below this training budget — mixing "
                         "budgets makes curves spuriously non-monotone "
                         "(an undertrained middle lambda dips below both "
                         "neighbors)")
    args = ap.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    points = load_points(args.inp)
    if args.min_steps:
        points = [p for p in points
                  if p.get("steps", 10 ** 9) >= args.min_steps]
    tasks = sorted({t for p in points for t in p.get("tasks", [])})
    os.makedirs(args.out_dir, exist_ok=True)

    baseline_pts = []
    if args.baseline and os.path.exists(args.baseline):
        with open(args.baseline) as f:
            baseline_pts = json.load(f)
        # only overlay points whose checkpoint still exists: a leftover
        # overlay from a deleted sweep (possibly on another data style)
        # would silently contaminate the figures otherwise. Checkpoint
        # paths are repo-relative — resolve them against the repo root so
        # the filter works from any cwd, and only treat a point as stale
        # when it CARRIES a checkpoint key that is gone (round-4 advisor)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        stale = [p for p in baseline_pts
                 if "checkpoint" in p
                 and not os.path.exists(os.path.join(repo, p["checkpoint"]))]
        if stale:
            print(f"baseline overlay: dropping {len(stale)} stale point(s) "
                  "whose checkpoints no longer exist")
        baseline_pts = [p for p in baseline_pts if p not in stale]

    classical_pts = []
    if args.classical and os.path.exists(args.classical):
        with open(args.classical) as f:
            classical_pts = json.load(f)

    summary = {"bpp_key": args.bpp_key, "min_steps": args.min_steps,
               "run_budgets": {p["run"]: p.get("steps") for p in points
                               if "run" in p},
               "tasks": {}, "ordering": {}}

    for task in tasks:
        curves = curves_by_kind(points, task, args.bpp_key)
        fig, axes = plt.subplots(1, 2, figsize=(11, 4))
        plot_kinds = KIND_ORDER + sorted(set(curves) - set(KIND_ORDER))
        for kind in plot_kinds:
            if kind not in curves:
                continue
            c = curves[kind]
            xs = [p[0] for p in c]
            axes[0].plot(xs, [p[1] for p in c], marker="o", label=kind)
            axes[1].plot(xs, [p[2] for p in c], marker="o", label=kind)
        overlay = [(p["bpp"], p.get(f"{task}/psnr"))
                   for p in baseline_pts if f"{task}/psnr" in p]
        if overlay:
            n = baseline_pts[0].get("n_images", "?")
            axes[0].scatter([o[0] for o in overlay], [o[1] for o in overlay],
                            marker="x", s=60, color="k", zorder=5,
                            label=f"learned baseline (n={n})")
        classical = {}
        for p in classical_pts:
            if p.get("task") == task and f"{task}/psnr" in p:
                classical.setdefault(p["codec"], []).append(
                    (p["bpp"], p[f"{task}/psnr"], p.get(f"{task}/mse255")))
        if classical:
            # classical codecs bottom out orders of magnitude above the
            # learned models' rates — log-x keeps both regimes readable
            for ax in axes:
                ax.set_xscale("log")
            for codec, pts in sorted(classical.items()):
                pts.sort()
                axes[0].plot([p[0] for p in pts], [p[1] for p in pts],
                             ls="--", marker=".", alpha=0.7, label=codec)
                if all(p[2] is not None for p in pts):
                    axes[1].plot([p[0] for p in pts], [p[2] for p in pts],
                                 ls="--", marker=".", alpha=0.7, label=codec)
            summary.setdefault("classical", {})[task] = {
                codec: {"min_bpp": min(p[0] for p in pts),
                        "psnr_at_min_bpp": min(pts)[1]}
                for codec, pts in classical.items()}
        axes[0].set_xlabel("bpp"); axes[0].set_ylabel(f"{task} PSNR (dB)")
        if task == "semantic":
            axes[1].set_xlabel("bpp"); axes[1].set_ylabel("semantic mIoU")
        else:
            axes[1].set_xlabel("bpp"); axes[1].set_ylabel(f"{task} MSE*255^2")
            axes[1].set_yscale("log")
        for ax in axes:
            ax.grid(True, alpha=0.3); ax.legend()
        fig.suptitle(f"{task} rate-distortion ({args.bpp_key})")
        fig.tight_layout()
        out = os.path.join(args.out_dir, f"rd_{task}.png")
        fig.savefig(out, dpi=150)
        plt.close(fig)

        summary["tasks"][task] = {
            kind: {"points": curves[kind],
                   "monotone_fraction": monotone_fraction(curves[kind])}
            for kind in curves}

    # ordering check at matched rates: evaluate every multi-task curve at the
    # single models' achieved bpps (paper Fig. 4 convention, avg over tasks).
    # Points whose checkpoints were lost (declared via checkpoints_lost) are
    # plotted but excluded here: a non-rederivable point must not carry the
    # headline ranking (round-4 advisor)
    ordering_points = [p for p in points if not p.get("checkpoints_lost")]
    n_lost = len(points) - len(ordering_points)
    if n_lost:
        print(f"ordering: excluding {n_lost} checkpoints_lost point(s)")
    summary["ordering"]["n_checkpoints_lost_excluded"] = n_lost
    per_kind_avg = {}
    n_extrapolated = 0
    for task in tasks:
        if task == "semantic":
            continue  # the paper's Fig. 4 ordering averages the 3 common
            # tasks; semantic has its own bpp-vs-mIoU figure
        curves = curves_by_kind(ordering_points, task, args.bpp_key)
        if "single" not in curves:
            continue
        for bpp, psnr, _ in curves["single"]:
            vals = {}
            for kind, c in curves.items():
                if kind not in KIND_ORDER:
                    continue  # extra rows (e.g. 4-task shared4) are plotted
                    # but stay out of the paper's 4-family ranking
                vals[kind] = psnr if kind == "single" else interp_psnr(c, bpp)
            if any(v is None for v in vals.values()):
                # a matched-rate sample is only fair when EVERY curve spans
                # this bpp — otherwise drop the whole sample point
                n_extrapolated += 1
                continue
            for kind, v in vals.items():
                per_kind_avg.setdefault(kind, []).append(v)
    avg = {k: float(np.mean(v)) for k, v in per_kind_avg.items() if v}
    summary["ordering"]["avg_psnr_at_matched_bpp"] = avg
    summary["ordering"]["n_matched_samples"] = (
        len(next(iter(per_kind_avg.values()), [])))
    summary["ordering"]["n_samples_skipped_out_of_range"] = n_extrapolated
    ranked = sorted(avg, key=avg.get, reverse=True)
    summary["ordering"]["ranking"] = ranked
    summary["ordering"]["paper_ranking"] = KIND_ORDER
    # Secondary, clearly-labeled proxy: ordering at matched LAMBDA (same
    # training tradeoff, different achieved rates). The paper's headline
    # comparison is at matched RATE (above) — but matched-rate sampling
    # needs every curve to SPAN the single models' bpps, impossible when a
    # sweep has one lambda per family (single-point curves span nothing).
    # This block fires in that regime and is reported separately; it never
    # feeds matches_paper.
    summary["ordering"]["at_matched_lambda"] = at_matched_lambda(
        ordering_points, tasks)
    # the paper's headline claim ranks FOUR families (paper §V-A Fig. 4);
    # a subset match is reported as partial, never as matches_paper
    full = set(ranked) >= set(KIND_ORDER)
    in_paper_order = ranked == [k for k in KIND_ORDER if k in ranked]
    summary["ordering"]["matches_paper"] = bool(full and in_paper_order)
    if not full:
        summary["ordering"]["partial_ordering"] = in_paper_order
        summary["ordering"]["kinds_missing"] = [
            k for k in KIND_ORDER if k not in ranked]

    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary["ordering"], indent=2))
    print(f"wrote {args.out_dir}/rd_<task>.png + summary.json")


if __name__ == "__main__":
    main(sys.argv[1:])
