"""Semantic rate-starvation lambda-response artifact.

DESIGN.md ("Why semantic mIoU is frozen") diagnosed the frozen
single-semantic mIoU as rate starvation: with loss = lambda*rec + rate
(reference multi_task_compressor.py:437) and semantic CE mean-over-pixels
(:244-247) — ~5 orders of magnitude below the summed-over-HW MSE tasks —
the rate term wins at lambda <= 0.1 and empties the latent. The knob that
buys the latent bits is therefore a LARGER lambda. This script turns that
diagnosis into a measured lambda-response curve from the committed runs:
per lambda, the latent's actual rate, the val-mIoU trajectory, and
whether the argmax label map ever moved (the bit-frozen signature).

    python scripts/semantic_lambda_response.py [--out artifacts/...]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_trajectory(run_dir, run):
    path = os.path.join(run_dir, run, f"{run}.metrics.jsonl")
    if not os.path.exists(path):
        return None
    traj = []
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "val/semantic/miou" in rec:
                traj.append({"step": rec["step"],
                             "miou": rec["val/semantic/miou"],
                             "val_bpp": rec.get("val/compression_loss")})
    return traj


def build_report(points, run_dir="runs/rd_clevr", trajectory_artifact=None):
    """points: rd_clevr.json list. Returns the lambda-response report.

    trajectory_artifact: optional path to a committed
    semantic_trajectory.json — used as frozen-evidence fallback for runs
    whose val-metrics JSONL no longer exists (environment reset): a
    pre-reset `miou_delta_last_quarter == 0.0` is the same frozen
    signature, measured before the loss.
    """
    pre_reset = {}
    if trajectory_artifact and os.path.exists(trajectory_artifact):
        with open(trajectory_artifact) as f:
            pre_reset = json.load(f)
    rows = {}
    for p in points:
        if p.get("kind") != "single-semantic":
            continue
        traj = run_trajectory(run_dir, p["run"]) or []
        mious = [t["miou"] for t in traj]
        # the frozen signature: identical mIoU (to 1e-9) at every val epoch
        frozen = (len(set(round(m, 9) for m in mious)) <= 1
                  if len(mious) >= 2 else None)
        frozen_source = "val-metrics jsonl" if frozen is not None else None
        if frozen is None:
            prev = pre_reset.get(p["run"])
            if isinstance(prev, dict) and \
                    prev.get("miou_delta_last_quarter") == 0.0:
                frozen = True
                frozen_source = "semantic_trajectory.json (pre-reset)"
        rows[p["run"]] = {
            "lmbda": p["lmbda"],
            "steps": p.get("steps"),
            "actual_bpp": p.get("actual_bpp"),
            "final_miou": p.get("semantic/miou"),
            "val_miou_first": mious[0] if mious else None,
            "val_miou_last": mious[-1] if mious else None,
            "val_miou_max": max(mious) if mious else None,
            "label_map_frozen": frozen,
            "label_map_frozen_source": frozen_source,
            "n_val_points": len(mious),
            "trajectory": traj[-40:],
        }
    by_l = sorted(rows.values(), key=lambda r: r["lmbda"])
    claim = {
        "mechanism": "loss = lambda*rec + rate with CE mean-over-pixels "
                     "(reference parity, multi_task_compressor.py:244-247,"
                     ":437): at lambda <= 0.1 the rate term empties the "
                     "semantic latent and the label map freezes; larger "
                     "lambda buys the latent bits and mIoU moves",
        "monotone_bpp_in_lambda": all(
            (a["actual_bpp"] or 0) <= (b["actual_bpp"] or 0) + 1e-9
            for a, b in zip(by_l, by_l[1:])
            if a["actual_bpp"] is not None and b["actual_bpp"] is not None),
        "starved_lambdas": [r["lmbda"] for r in by_l if r["label_map_frozen"]],
        "alive_lambdas": [r["lmbda"] for r in by_l
                          if r["label_map_frozen"] is False],
    }
    return {"claim": claim, "runs": rows}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default="artifacts/rd_clevr.json")
    ap.add_argument("--run-dir", default="runs/rd_clevr")
    ap.add_argument("--out", default="artifacts/semantic_lambda_response.json")
    ap.add_argument("--trajectory-artifact",
                    default="artifacts/semantic_trajectory.json",
                    help="pre-reset frozen-evidence fallback ('' disables)")
    args = ap.parse_args(argv)

    with open(os.path.join(REPO, args.points)) as f:
        points = json.load(f)
    report = build_report(
        points, os.path.join(REPO, args.run_dir),
        trajectory_artifact=(os.path.join(REPO, args.trajectory_artifact)
                             if args.trajectory_artifact else None))
    out = os.path.join(REPO, args.out)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["claim"], indent=2))
    for run, r in sorted(report["runs"].items()):
        print(f"{run}: lambda={r['lmbda']} steps={r['steps']} "
              f"bpp={r['actual_bpp']} miou {r['val_miou_first']} -> "
              f"{r['val_miou_last']} frozen={r['label_map_frozen']}")


if __name__ == "__main__":
    main()
