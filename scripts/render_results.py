"""Render the round's headline results as a README-ready markdown block.

Reads whichever of these exist and prints markdown to stdout:
  artifacts/rd_clevr_eval_at12k.json   (budget-matched full-val RD points)
  artifacts/rd_clevr_plots/summary.json (4-way ranking + monotone fractions)
  artifacts/flagship_eval.json          (flagship shared4 eval)
  artifacts/profile_roundtrip.json      (streaming pipeline throughput)

Keeps the README honest: numbers come from committed artifacts only.
"""

import json
import os
import sys


def load(p):
    try:
        with open(p) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def main():
    ev = load("artifacts/rd_clevr_eval_at12k.json")
    summ = load("artifacts/rd_clevr_plots/summary.json")
    fl = load("artifacts/flagship_eval.json")
    prof = load("artifacts/profile_roundtrip.json")

    if ev:
        print("### RD points @ matched 12k-step budget "
              "(full val, real rANS bytes, clevr-style synthetic)\n")
        print("| run | steps | actual bpp | rgb PSNR | depth PSNR | "
              "normal PSNR | semantic mIoU |")
        print("|---|---|---|---|---|---|---|")
        for e in sorted(ev, key=lambda d: d["run"]):
            def g(k, fmt="{:.2f}"):
                v = e.get(k)
                return fmt.format(v) if v is not None else "—"
            print(f"| {e['run']} | {e['steps']} | "
                  f"{g('actual_bpp', '{:.4f}')} | {g('rgb/psnr')} | "
                  f"{g('depth_euclidean/psnr')} | {g('normal/psnr')} | "
                  f"{g('semantic/miou', '{:.3f}')} |")
        print()

    if summ:
        o = summ.get("ordering") or {}
        r = o.get("ranking")
        mp = o.get("matches_paper")
        if r:
            print(f"4-way family ranking at matched bpp: "
                  f"**{' > '.join(r)}** "
                  f"(paper: Mixed > Shared > Disjoint > Single; "
                  f"matches_paper={mp})\n")
        ml = o.get("at_matched_lambda") or {}
        for lm, e in sorted(ml.items()):
            if e.get("ranking") and len(e["ranking"]) == 4:
                print(f"4-way ordering at matched lambda={lm} (proxy — "
                      f"achieved rates differ; tasks "
                      f"{','.join(e['tasks_compared'])}): "
                      f"**{' > '.join(e['ranking'])}** "
                      f"(in paper order: {e['in_paper_order']})\n")
        mf = {}
        for task, fams in (summ.get("tasks") or {}).items():
            for fam, d in fams.items():
                # a 1-point "curve" is trivially monotone — don't count it
                if (isinstance(d, dict) and "monotone_fraction" in d
                        and len(d.get("points", [])) >= 2):
                    mf[f"{task}/{fam}"] = d["monotone_fraction"]
        if mf:
            frac = sum(1 for v in mf.values() if v == 1.0) / len(mf)
            print(f"Monotone RD curves: {frac:.0%} of {len(mf)} "
                  f"(task,family) curves with >=2 rate points\n")

    if fl:
        vm = fl.get("val_metrics", {})
        print(f"Flagship (shared4, step {fl.get('step')}): "
              f"rgb {vm.get('val/rgb/psnr', float('nan')):.2f} dB, "
              f"semantic mIoU {vm.get('val/semantic/miou', float('nan')):.3f}, "
              f"partial-decode==full: {fl.get('partial_matches_full')}\n")

    if prof:
        best_key = max((k for k in prof if k.startswith("pipelined_mps")),
                       key=lambda k: prof[k] or 0, default=None)
        if best_key:
            print(f"Streaming compress+decompress (batch "
                  f"{prof.get('batch_size')}): serial "
                  f"{prof.get('serial_mps', 0):.1f} MP/s, best pipelined "
                  f"{prof.get(best_key, 0):.1f} MP/s ({best_key})\n")

    if not any([ev, summ, fl, prof]):
        print("(no artifacts found)", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
