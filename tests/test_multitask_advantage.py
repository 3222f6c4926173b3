"""The aggregate multi-task-vs-single-bank report (scripts/multitask_advantage.py).

Fixture encodes the paper's claim structure (Fig. 4a/b, src/plots.ipynb
cells 17-42): a multi-task stream cheaper than the summed single streams
with no task below its dedicated single must be flagged as dominating;
one that loses a task by more than noise must not.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.multitask_advantage import TASKS, build_report  # noqa: E402


def _point(run, bpp, steps=50000, **psnr):
    p = {"run": run, "actual_bpp": bpp, "steps": steps}
    for t, v in psnr.items():
        task = {"rgb": "rgb", "depth": "depth_euclidean",
                "normal": "normal"}[t]
        p[f"{task}/psnr"] = v
    return p


def _fixture(disjoint_rgb):
    at50 = {
        "mixed-l0.1": _point("mixed-l0.1", 0.004,
                             rgb=23.6, depth=35.3, normal=29.4),
        "shared-l0.1": _point("shared-l0.1", 0.0012,
                              rgb=21.68, depth=30.7, normal=27.9),
        "disjoint-l0.1": _point("disjoint-l0.1", 0.0009,
                                rgb=disjoint_rgb, depth=30.7, normal=27.9),
        "single-rgb-l0.1": _point("single-rgb-l0.1", 0.0004, rgb=21.68),
    }
    at12 = {
        "single-depth_euclidean-l0.1": _point(
            "single-depth_euclidean-l0.1", 0.0033, steps=12000, depth=30.4),
        "single-normal-l0.1": _point(
            "single-normal-l0.1", 0.0011, steps=12000, normal=27.8),
    }
    return at50, at12


def test_dominating_variants_flagged():
    rep = build_report(*_fixture(disjoint_rgb=21.68))
    bank = rep["single_task_bank"]
    assert abs(bank["total_bpp"] - 0.0048) < 1e-12
    assert bank["n_models"] == 3
    for run in ("mixed-l0.1", "shared-l0.1", "disjoint-l0.1"):
        assert rep["multi_task"][run]["dominates_bank"], run
    dj = rep["multi_task"]["disjoint-l0.1"]
    assert dj["rate_saving_vs_bank"] > 5
    assert all(dj["psnr_delta_vs_bank"][t] > -0.05 for t in TASKS)


def test_losing_a_task_breaks_domination():
    rep = build_report(*_fixture(disjoint_rgb=21.0))  # 0.68 dB below single
    assert not rep["multi_task"]["disjoint-l0.1"]["dominates_bank"]
    # the others are untouched by the perturbation
    assert rep["multi_task"]["mixed-l0.1"]["dominates_bank"]
