"""Post-sweep roundup: figures + ordering check + learned-baseline overlay.

Runs after scripts/rd_paper_sweep.py:
  1. scripts/rd_plots.py — per-task RD figures + monotonicity/ordering summary
  2. analysis.learned_baseline_rd over the sweep's single-rgb checkpoints
     (the pretrained-hyperprior stand-in of plots.ipynb cell 5), written to
     artifacts/learned_baseline_rd.json

    python scripts/rd_roundup.py [--run-dir runs/rd_paper]
"""

import argparse
import glob
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", default="runs/rd_paper")
    ap.add_argument("--in", dest="inp", default="artifacts/rd_paper.json")
    ap.add_argument("--out-dir", default="artifacts/rd_paper_plots")
    ap.add_argument("--min-steps", type=int, default=0)
    ap.add_argument("--data-style", default="legacy",
                    choices=["legacy", "clevr"])
    ap.add_argument("--platform", default=None, choices=["cpu"],
                    help="force the jax backend (the axon TPU plugin "
                         "ignores JAX_PLATFORMS; a dead tunnel hangs "
                         "backend init)")
    ap.add_argument("--baseline-n-images", type=int, default=256,
                    help="val images per learned-baseline overlay point")
    args = ap.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    # classical-codec overlay (paper Fig. 4's JPEG curve): data-only, no
    # checkpoints involved — generate once per data style, then reuse
    classical = "artifacts/classical_rd.json"
    style_ok = False
    if os.path.exists(classical):
        with open(classical) as f:
            pts = json.load(f)
        style_ok = bool(pts) and all(
            p.get("data_style") == args.data_style for p in pts)
    if not style_ok:
        try:
            from scripts import classical_rd
            classical_rd.main(["--data-style", args.data_style])
        except Exception as e:  # noqa: BLE001 — overlay is optional
            print(f"classical overlay generation failed: {e}")

    from scripts import rd_plots
    rd_plots.main(["--in", args.inp, "--out-dir", args.out_dir,
                   "--min-steps", str(args.min_steps)])

    from mmnc_tpu import analysis
    ckpts = []
    for run in sorted(glob.glob(os.path.join(args.run_dir, "single-rgb-l*"))):
        steps = sorted(glob.glob(os.path.join(run, "checkpoints", "step_*")),
                       key=lambda p: int(p.rsplit("_", 1)[1]))
        if steps:
            ckpts.append(steps[-1])
    if ckpts:
        points = analysis.learned_baseline_rd(
            ckpts, batch_size=16, n_images=args.baseline_n_images,
            data_style=args.data_style)
        with open("artifacts/learned_baseline_rd.json", "w") as f:
            json.dump(points, f, indent=2)
        print(f"learned-baseline overlay: {len(points)} points ->"
              " artifacts/learned_baseline_rd.json")
        for p in points:
            print(f"  lmbda={p['lmbda']}: bpp={p['bpp']:.4f} "
                  f"rgb/psnr={p['rgb/psnr']:.2f}")
        # re-render so the figures include the overlay just regenerated
        # (the first render ran before it existed / with the old file);
        # rendering FIRST keeps the figures safe if this step times out
        rd_plots.main(["--in", args.inp, "--out-dir", args.out_dir,
                       "--min-steps", str(args.min_steps)])
    else:
        print("no single-rgb checkpoints found; skipping baseline overlay")


if __name__ == "__main__":
    main()
