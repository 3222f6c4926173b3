"""Semantic-task training trajectory: CE and val mIoU vs steps.

VERDICT r4 task 3 asks either mIoU >= 0.3 or the committed trajectory
proving the asymptote. Every run logs `semantic/cross-entropy` per log
interval and `val/semantic/miou` per val epoch (utils/logging.py JSONL
sink), so this extracts both series for all semantic-bearing runs and
writes artifacts/semantic_trajectory.json plus a small PNG.

    python scripts/semantic_trajectory.py [--run-dir runs/rd_clevr]
"""

import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def series(metrics_path):
    ce, miou = [], []
    with open(metrics_path) as f:
        for line in f:
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            s = r.get("step")
            if s is None:
                continue
            if "semantic/cross-entropy" in r:
                ce.append([s, r["semantic/cross-entropy"]])
            if "val/semantic/miou" in r:
                miou.append([s, r["val/semantic/miou"]])
    return ce, miou


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", default="runs/rd_clevr")
    ap.add_argument("--out", default="artifacts/semantic_trajectory.json")
    ap.add_argument("--png", default="artifacts/rd_clevr_plots/"
                                     "semantic_trajectory.png")
    args = ap.parse_args()

    # MERGE over the prior artifact: a run whose metrics JSONL no longer
    # exists (environment reset) keeps its committed trajectory instead of
    # being silently erased by the rewrite (the same keep-unvisited rule
    # the round-4 advisor required of rd_reeval). Re-extracted runs
    # replace their old entries.
    out = {}
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                out = {run: dict(entry, kept_from_prior_artifact=True)
                       for run, entry in json.load(f).items()}
        except (json.JSONDecodeError, AttributeError):
            out = {}
    for mp in sorted(glob.glob(
            os.path.join(args.run_dir, "*", "*.metrics.jsonl"))):
        run = os.path.basename(os.path.dirname(mp))
        ce, miou = series(mp)
        if not ce and not miou:
            continue
        entry = {"cross_entropy_vs_step": ce, "val_miou_vs_step": miou}
        if miou:
            entry["final_miou"] = miou[-1][1]
            entry["final_miou_step"] = miou[-1][0]
            # asymptote signal: best-half vs last-quarter improvement
            if len(miou) >= 8:
                q = len(miou) // 4
                last_q = [v for _, v in miou[-q:]]
                prev_q = [v for _, v in miou[-2 * q:-q]]
                entry["miou_delta_last_quarter"] = (
                    sum(last_q) / len(last_q) - sum(prev_q) / len(prev_q))
        out[run] = entry
        print(f"{run}: {len(ce)} CE points, {len(miou)} mIoU points, "
              f"final mIoU {entry.get('final_miou')}")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
        for run, e in out.items():
            if e["cross_entropy_vs_step"]:
                s, v = zip(*e["cross_entropy_vs_step"])
                ax1.plot(s, v, label=run, lw=1)
            if e["val_miou_vs_step"]:
                s, v = zip(*e["val_miou_vs_step"])
                ax2.plot(s, v, marker=".", label=run, lw=1)
        ax1.set_xlabel("step"); ax1.set_ylabel("semantic cross-entropy")
        ax1.set_yscale("log"); ax1.legend(fontsize=7)
        ax2.set_xlabel("step"); ax2.set_ylabel("val mIoU (present classes)")
        ax2.axhline(1 / 17, color="gray", ls=":", lw=1, label="1/17 floor")
        ax2.legend(fontsize=7)
        fig.suptitle("Semantic task trajectory (clevr-style synthetic)")
        fig.tight_layout()
        os.makedirs(os.path.dirname(args.png) or ".", exist_ok=True)
        fig.savefig(args.png, dpi=120)
        print(f"wrote {args.png}")
    except Exception as e:  # noqa: BLE001 — plot is best-effort
        print(f"plot skipped: {e}")


if __name__ == "__main__":
    main()
