"""declare_lost_checkpoints.stamp: only actually-orphaned rows get the flag."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts import declare_lost_checkpoints as dlc


def test_stamp_only_missing_checkpoint_rows(tmp_path, monkeypatch):
    # one row whose checkpoint exists, one whose doesn't
    monkeypatch.setattr(dlc, "REPO", str(tmp_path))
    live = tmp_path / "runs" / "x" / "checkpoints" / "step_100"
    live.mkdir(parents=True)
    art = tmp_path / "eval.json"
    rows = [
        {"run": "a", "checkpoint": "runs/x/checkpoints/step_100"},
        {"run": "b", "checkpoint": "runs/gone/checkpoints/step_100"},
    ]
    art.write_text(json.dumps(rows))
    n = dlc.stamp(str(art), "test note")
    assert n == 1
    out = json.loads(art.read_text())
    assert "checkpoints_lost" not in out[0]
    assert out[1]["checkpoints_lost"] is True
    assert out[1]["checkpoints_lost_note"] == "test note"


def test_stamp_run_keyed_rows_and_dict_artifact(tmp_path, monkeypatch):
    monkeypatch.setattr(dlc, "REPO", str(tmp_path))
    (tmp_path / "runs" / "rd" / "ok" / "checkpoints" / "step_5").mkdir(
        parents=True)
    # list artifact keyed by `run` (sweep-point style)
    art = tmp_path / "sweep.json"
    art.write_text(json.dumps([{"run": "ok"}, {"run": "lost"}]))
    assert dlc.stamp(str(art), "n", run_root="runs/rd") == 1
    out = json.loads(art.read_text())
    assert "checkpoints_lost" not in out[0]
    assert out[1]["checkpoints_lost"] is True
    # dict artifact (flagship-eval style); idempotent on rerun
    d = tmp_path / "flag.json"
    d.write_text(json.dumps({"checkpoint": "runs/gone/step_1"}))
    assert dlc.stamp(str(d), "n") == 1
    assert dlc.stamp(str(d), "other") == 0  # already stamped — kept as-is
    assert json.loads(d.read_text())["checkpoints_lost_note"] == "n"
