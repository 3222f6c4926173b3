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
