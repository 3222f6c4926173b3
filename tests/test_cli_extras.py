"""RD-sweep CLI and profiling utility tests (CPU)."""

import os


def test_rd_sweep_cli(tmp_path):
    from mmnc_tpu.cli.rd_sweep import main

    out_dir = str(tmp_path / "runs")
    points = main([
        "-d", "synthetic", "-t", "mono", "-m", "1", "-l", "8", "-c", "4",
        "-w", "sweeptest", "--lmbdas", "0.01", "--epochs", "1",
        "--batch-size", "2", "--train-size", "4", "--val-size", "2",
        "--max-steps", "2", "--out-dir", out_dir])
    assert len(points) == 1
    assert points[0]["lmbda"] == 0.01 and points[0]["bpp"] > 0
    assert os.path.exists(tmp_path / "runs" / "sweeptest" / "rd_points.json")
    assert os.path.exists(tmp_path / "runs" / "sweeptest" / "rd_mono.png")


def test_step_timer():
    import time
    from mmnc_tpu.utils.profiling import StepTimer

    t = StepTimer(skip_first=1)
    for _ in range(6):
        t.tick()
        time.sleep(0.01)
    s = t.stats()
    assert s["steps"] == 4
    assert 0.005 < s["mean_s"] < 0.1
    assert s["steps_per_s"] > 5


def test_trace_writes_files(tmp_path):
    import jax
    import jax.numpy as jnp
    from mmnc_tpu.utils.profiling import trace

    with trace(str(tmp_path)):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    found = []
    for root, _, files in os.walk(tmp_path):
        found.extend(files)
    assert found, "profiler trace produced no files"
