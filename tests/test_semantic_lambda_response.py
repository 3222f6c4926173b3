"""semantic_lambda_response.build_report: frozen detection + claim logic."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.semantic_lambda_response import build_report


def _write_run(tmp_path, run, mious, bpps):
    d = tmp_path / run
    d.mkdir(parents=True)
    with open(d / f"{run}.metrics.jsonl", "w") as f:
        for i, (m, b) in enumerate(zip(mious, bpps)):
            f.write(json.dumps({"step": 640 * (i + 1),
                                "val/semantic/miou": m,
                                "val/compression_loss": b}) + "\n")


def test_frozen_vs_alive_classification(tmp_path):
    _write_run(tmp_path, "single-semantic-l0.1",
               [0.0599] * 5, [3e-5] * 5)
    _write_run(tmp_path, "single-semantic-l1",
               [0.0599, 0.061, 0.067, 0.080], [0.01] * 4)
    points = [
        {"run": "single-semantic-l0.1", "kind": "single-semantic",
         "lmbda": 0.1, "steps": 30000, "actual_bpp": 3.05e-5,
         "semantic/miou": 0.0599},
        {"run": "single-semantic-l1", "kind": "single-semantic",
         "lmbda": 1.0, "steps": 20000, "actual_bpp": 0.011,
         "semantic/miou": 0.080},
        {"run": "mixed-l0.1", "kind": "mixed", "lmbda": 0.1},  # ignored
    ]
    r = build_report(points, str(tmp_path))
    assert set(r["runs"]) == {"single-semantic-l0.1", "single-semantic-l1"}
    assert r["runs"]["single-semantic-l0.1"]["label_map_frozen"] is True
    assert r["runs"]["single-semantic-l1"]["label_map_frozen"] is False
    assert r["claim"]["starved_lambdas"] == [0.1]
    assert r["claim"]["alive_lambdas"] == [1.0]
    assert r["claim"]["monotone_bpp_in_lambda"] is True
    assert r["runs"]["single-semantic-l1"]["val_miou_last"] == 0.080


def test_missing_metrics_file_is_tolerated(tmp_path):
    points = [{"run": "single-semantic-l9", "kind": "single-semantic",
               "lmbda": 9.0, "steps": 100, "actual_bpp": 0.5,
               "semantic/miou": 0.1}]
    r = build_report(points, str(tmp_path))
    row = r["runs"]["single-semantic-l9"]
    assert row["label_map_frozen"] is None
    assert row["n_val_points"] == 0


def test_pre_reset_frozen_fallback(tmp_path):
    # no metrics JSONL on disk, but the committed trajectory artifact
    # carries the pre-reset frozen signature -> classified starved
    traj = tmp_path / "semantic_trajectory.json"
    traj.write_text(json.dumps({
        "single-semantic-l0.1": {"final_miou": 0.0599,
                                 "miou_delta_last_quarter": 0.0},
        "single-semantic-l1": {"final_miou": 0.08,
                               "miou_delta_last_quarter": 0.004},
    }))
    points = [{"run": "single-semantic-l0.1", "kind": "single-semantic",
               "lmbda": 0.1, "steps": 12000, "actual_bpp": 3e-5,
               "semantic/miou": 0.0599}]
    r = build_report(points, str(tmp_path), trajectory_artifact=str(traj))
    row = r["runs"]["single-semantic-l0.1"]
    assert row["label_map_frozen"] is True
    assert row["label_map_frozen_source"] == \
        "semantic_trajectory.json (pre-reset)"
    assert r["claim"]["starved_lambdas"] == [0.1]
