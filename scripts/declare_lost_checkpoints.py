"""Stamp `checkpoints_lost` declarations onto artifacts orphaned by an
environment reset.

An artifact row is stamped only when the checkpoint it references is
actually missing on disk — rows whose checkpoints exist are left alone.
check_artifacts.py downgrades a missing-checkpoint failure to a listed
note ONLY when the flag is accompanied by a human-readable
`checkpoints_lost_note` saying what was lost (round-4 advisor), so the
note text is a required argument.

    python scripts/declare_lost_checkpoints.py --note "..." \
        artifacts/rd_clevr_eval_at12k.json artifacts/flagship_eval.json
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


def orphaned(p, run_root):
    """True iff the row references a checkpoint that no longer exists."""
    ck = p.get("checkpoint")
    if ck is not None:
        return not os.path.exists(os.path.join(REPO, ck))
    run = p.get("run")
    if run and run_root:
        return newest_step(os.path.join(REPO, run_root, run)) is None
    return False


def stamp(path, note, run_root=None):
    with open(path) as f:
        data = json.load(f)
    rows = data if isinstance(data, list) else [data]
    n = 0
    for p in rows:
        if orphaned(p, run_root) and not p.get("checkpoints_lost"):
            p["checkpoints_lost"] = True
            p["checkpoints_lost_note"] = note
            n += 1
    if n:
        with open(path, "w") as f:
            json.dump(data, f, indent=2)
    print(f"{path}: stamped {n}/{len(rows)} rows")
    return n


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="+")
    ap.add_argument("--note", required=True,
                    help="human-readable note: WHAT was lost and when")
    ap.add_argument("--run-root", default="runs/rd_clevr",
                    help="run root for rows keyed by `run` instead of a "
                         "`checkpoint` path")
    args = ap.parse_args(argv)
    total = 0
    for path in args.paths:
        total += stamp(path, args.note, args.run_root)
    print(f"total stamped: {total}")


if __name__ == "__main__":
    main()
