"""Artifact/run-dir consistency check (round-3 verdict: committed
artifacts must not contradict the code or the run directories).

For every RD point in the sweep/eval artifacts, assert its `steps` field
matches the newest checkpoint of the corresponding run directory (points
tagged `stale: true` by the sweep's failure path are exempt but listed).
Also checks flagship_eval.json against its checkpoint path.

    python scripts/check_artifacts.py            # report + exit code
    python scripts/check_artifacts.py --fix      # rewrite steps fields
                                                 # from the run dirs
"""

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_step(run_dir):
    steps = [int(m.group(1)) for p in
             glob.glob(os.path.join(run_dir, "checkpoints", "step_*"))
             if (m := re.search(r"step_(\d+)$", p))]
    return max(steps) if steps else None


def check_points(path, run_root, fix=False):
    if not os.path.exists(path):
        return [], False
    with open(path) as f:
        points = json.load(f)
    problems, changed = [], False
    for p in points:
        run = p.get("run")
        if not run:
            continue
        actual = newest_step(os.path.join(run_root, run))
        if actual is None:
            # an environment reset can orphan an artifact from its run dir;
            # points that declare the loss are honest history, not drift —
            # but the flag alone is self-certified, so it only downgrades
            # the failure when a human-readable note says WHAT was lost
            # (round-4 advisor)
            lost_ok = (p.get("checkpoints_lost")
                       and p.get("checkpoints_lost_note"))
            tag = "note(checkpoints_lost) " if lost_ok else ""
            if p.get("checkpoints_lost") and not lost_ok:
                tag = "flag-without-note "
            problems.append(
                f"{tag}{path}: {run} has no checkpoints on disk")
            continue
        recorded = p.get("steps")
        if recorded != actual:
            if p.get("stale"):
                problems.append(
                    f"{path}: {run} steps={recorded} != ckpt {actual} "
                    f"(tagged stale: '{p.get('refresh_error', '?')[:60]}')")
            elif fix:
                p["steps"] = actual
                changed = True
            else:
                problems.append(
                    f"{path}: {run} steps={recorded} != newest ckpt {actual}")
    if fix and changed:
        with open(path, "w") as f:
            json.dump(points, f, indent=2)
        print(f"rewrote {path}")
    return problems, changed


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--fix", action="store_true")
    args = ap.parse_args(argv)

    hard, soft = [], []
    for name, run_root in (
            ("artifacts/rd_paper_ext.json", "runs/rd_paper"),
            ("artifacts/rd_paper.json", "runs/rd_paper"),
            ("artifacts/rd_clevr.json", "runs/rd_clevr")):
        probs, _ = check_points(os.path.join(REPO, name),
                                os.path.join(REPO, run_root), args.fix)
        for p in probs:
            (soft if "tagged stale" in p or "note(checkpoints_lost)" in p
             else hard).append(p)

    # eval artifacts evaluate a *specific* checkpoint — their steps need
    # not equal the newest, but the checkpoint they name must exist.
    # The same declared-loss escape as check_points applies (an
    # environment reset orphans eval artifacts exactly like sweep
    # points): checkpoints_lost + a human-readable note downgrades the
    # failure to a listed note; the flag alone does not.
    def lost_ok(p):
        return bool(p.get("checkpoints_lost") and p.get("checkpoints_lost_note"))

    for name in ("artifacts/rd_paper_eval.json",
                 "artifacts/rd_paper_eval_at12k.json",
                 "artifacts/rd_paper_eval_at40k.json",
                 "artifacts/rd_clevr_eval.json",
                 "artifacts/rd_clevr_eval_at12k.json",
                 "artifacts/rd_clevr_eval_at50k.json"):
        path = os.path.join(REPO, name)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            points = json.load(f)
        for p in points:
            ck = p.get("checkpoint")
            if ck and not os.path.exists(os.path.join(REPO, ck)):
                if lost_ok(p):
                    soft.append(f"note(checkpoints_lost) {name}: "
                                f"missing checkpoint {ck}")
                else:
                    hard.append(f"{name}: missing checkpoint {ck}")

    for fname in ("flagship_eval.json", "latent_sparsity.json"):
        fl = os.path.join(REPO, "artifacts", fname)
        if not os.path.exists(fl):
            continue
        with open(fl) as f:
            summary = json.load(f)
        ck = summary.get("checkpoint")
        if ck and not os.path.exists(os.path.join(REPO, ck)):
            if lost_ok(summary):
                soft.append(f"note(checkpoints_lost) {fname}: "
                            f"missing checkpoint {ck}")
            else:
                hard.append(f"{fname}: missing checkpoint {ck}")

    for p in soft:
        print(f"note: {p}")
    for p in hard:
        print(f"FAIL: {p}")
    if hard:
        sys.exit(1)
    print(f"check_artifacts: OK ({len(soft)} stale-tagged notes)")


if __name__ == "__main__":
    main()
