"""RD figure/ordering tooling (scripts/rd_plots.py) on a synthetic sweep.

The fixture encodes the paper's expected structure (Figs. 4/7-9,
src/plots.ipynb cells 17-42): monotone per-kind curves with
Mixed > Shared > Disjoint > Single at matched rates; the tool must rank
them accordingly and report full monotonicity.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts import rd_plots  # noqa: E402


@pytest.fixture
def sweep_points(tmp_path):
    pts = []
    for kind, base in [("mixed", 30.0), ("shared", 29.0), ("disjoint", 28.0)]:
        for lmbda, bpp in [(0.1, 0.2), (0.01, 0.1), (0.001, 0.04)]:
            p = {"run": f"{kind}-l{lmbda}", "kind": kind, "lmbda": lmbda,
                 "tasks": ["rgb", "normal"], "actual_bpp": bpp}
            for t in p["tasks"]:
                p[f"{t}/psnr"] = base + 10 * bpp
                p[f"{t}/mse255"] = 255 ** 2 / 10 ** ((base + 10 * bpp) / 10)
            pts.append(p)
    for t in ["rgb", "normal"]:
        for lmbda, bpp in [(0.1, 0.21), (0.01, 0.11), (0.001, 0.05)]:
            pts.append({"run": f"single-{t}-l{lmbda}", "kind": f"single-{t}",
                        "lmbda": lmbda, "tasks": [t], "actual_bpp": bpp,
                        f"{t}/psnr": 26 + 10 * bpp, f"{t}/mse255": 1.0})
    path = tmp_path / "pts.json"
    path.write_text(json.dumps(pts))
    return str(path)


def test_curves_split_singles_per_task(sweep_points):
    pts = rd_plots.load_points(sweep_points)
    curves = rd_plots.curves_by_kind(pts, "rgb")
    assert set(curves) == {"mixed", "shared", "disjoint", "single"}
    # single-normal must not leak into the rgb curve
    assert len(curves["single"]) == 3
    assert curves["single"] == sorted(curves["single"])


def test_monotone_fraction():
    assert rd_plots.monotone_fraction([(0.1, 30, 1), (0.2, 31, 1)]) == 1.0
    assert rd_plots.monotone_fraction(
        [(0.1, 30, 1), (0.2, 29, 1), (0.3, 31, 1)]) == 0.5
    assert rd_plots.monotone_fraction([(0.1, 30, 1)]) == 1.0


def test_end_to_end_ordering_and_artifacts(sweep_points, tmp_path):
    out = tmp_path / "plots"
    rd_plots.main(["--in", sweep_points, "--out-dir", str(out)])
    summary = json.loads((out / "summary.json").read_text())
    assert summary["ordering"]["matches_paper"] is True
    assert summary["ordering"]["ranking"] == [
        "mixed", "shared", "disjoint", "single"]
    for task in ("rgb", "normal"):
        assert (out / f"rd_{task}.png").exists()
        mono = summary["tasks"][task]
        assert all(c["monotone_fraction"] == 1.0 for c in mono.values())


def test_matched_lambda_ordering(sweep_points, tmp_path):
    out = tmp_path / "plots_ml"
    rd_plots.main(["--in", sweep_points, "--out-dir", str(out)])
    summary = json.loads((out / "summary.json").read_text())
    ml = summary["ordering"]["at_matched_lambda"]
    for lm in ("0.1", "0.01", "0.001"):
        assert ml[lm]["tasks_compared"] == ["normal", "rgb"]
        assert ml[lm]["ranking"] == ["mixed", "shared", "disjoint", "single"]
        assert ml[lm]["in_paper_order"] is True


def test_matched_lambda_fires_on_single_lambda_sweeps(tmp_path):
    """One lambda per family -> single-point curves span no rate range, so
    the matched-rate ranking is empty; the matched-lambda proxy must still
    produce a full 4-kind ordering (and matches_paper must stay false —
    the proxy never feeds the headline gate)."""
    pts = []
    for kind, psnr in [("mixed", 32.0), ("shared", 31.0),
                       ("disjoint", 30.0)]:
        pts.append({"run": f"{kind}-l0.1", "kind": kind, "lmbda": 0.1,
                    "tasks": ["rgb"], "actual_bpp": 0.1 + psnr / 1000,
                    "rgb/psnr": psnr, "rgb/mse255": 1.0})
    pts.append({"run": "single-rgb-l0.1", "kind": "single-rgb",
                "lmbda": 0.1, "tasks": ["rgb"], "actual_bpp": 0.3,
                "rgb/psnr": 28.0, "rgb/mse255": 1.0})
    path = tmp_path / "pts.json"
    path.write_text(json.dumps(pts))
    out = tmp_path / "plots"
    rd_plots.main(["--in", str(path), "--out-dir", str(out)])
    summary = json.loads((out / "summary.json").read_text())
    assert summary["ordering"]["matches_paper"] is False
    ml = summary["ordering"]["at_matched_lambda"]["0.1"]
    assert ml["ranking"] == ["mixed", "shared", "disjoint", "single"]
    assert ml["in_paper_order"] is True


def test_out_of_range_matched_samples_are_skipped(tmp_path):
    """A multi-task curve that doesn't span a single model's bpp must not
    be scored with endpoint extrapolation (round-2 advisor): the sample is
    dropped for every kind and counted in the summary."""
    pts = []
    for lmbda, bpp in [(0.1, 0.2), (0.001, 0.1)]:
        pts.append({"run": f"mixed-l{lmbda}", "kind": "mixed",
                    "lmbda": lmbda, "tasks": ["rgb"], "actual_bpp": bpp,
                    "rgb/psnr": 30 + 10 * bpp, "rgb/mse255": 1.0})
    # single point far below mixed's bpp range -> out of range
    pts.append({"run": "single-rgb-l0.001", "kind": "single-rgb",
                "lmbda": 0.001, "tasks": ["rgb"], "actual_bpp": 0.01,
                "rgb/psnr": 20.0, "rgb/mse255": 1.0})
    path = tmp_path / "pts.json"
    path.write_text(json.dumps(pts))
    out = tmp_path / "plots"
    rd_plots.main(["--in", str(path), "--out-dir", str(out)])
    summary = json.loads((out / "summary.json").read_text())
    assert summary["ordering"]["n_samples_skipped_out_of_range"] == 1
    assert summary["ordering"]["n_matched_samples"] == 0
    # and a 2-family ranking can never claim the paper's 4-family match
    assert summary["ordering"]["matches_paper"] is False
    assert "kinds_missing" in summary["ordering"]


def test_min_steps_filters_mixed_budget_runs(sweep_points, tmp_path):
    pts = json.loads(open(sweep_points).read())
    for p in pts:
        p["steps"] = 40000 if p["lmbda"] != 0.01 else 2500
    path = tmp_path / "pts2.json"
    path.write_text(json.dumps(pts))
    out = tmp_path / "plots2"
    rd_plots.main(["--in", str(path), "--out-dir", str(out),
                   "--min-steps", "10000"])
    summary = json.loads((out / "summary.json").read_text())
    assert all(v >= 10000 for v in summary["run_budgets"].values())
    assert summary["min_steps"] == 10000


def test_stale_points_are_excluded(tmp_path):
    pts = [{"run": "mixed-l0.1", "kind": "mixed", "lmbda": 0.1,
            "tasks": ["rgb"], "actual_bpp": 0.2, "rgb/psnr": 31.0,
            "rgb/mse255": 1.0},
           {"run": "mixed-l0.001", "kind": "mixed", "lmbda": 0.001,
            "tasks": ["rgb"], "actual_bpp": 0.05, "rgb/psnr": 28.0,
            "rgb/mse255": 1.0, "stale": True}]
    curves = rd_plots.curves_by_kind(pts, "rgb")
    assert len(curves["mixed"]) == 1  # the stale point stays out
