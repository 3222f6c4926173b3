"""Harness tests: checkpoint save/restore/resume, CLI train+compress flows
(run on the CPU sim mesh; SURVEY.md §5 aux subsystems)."""

import json
import os

import numpy as np
import jax
import pytest
from flax.traverse_util import flatten_dict

from mmnc_tpu.models import build_model
from mmnc_tpu.train import create_train_state
from mmnc_tpu.utils.checkpoint import (
    save_checkpoint, restore_checkpoint, find_last_checkpoint,
    rebuild_model_from_checkpoint)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    model = build_model(1, ["mono"], latent_channels=8, conv_channels=4,
                        lmbda=1e-2)
    variables = model.init(jax.random.PRNGKey(0),
                           model.example_batch(image_size=256))
    state = create_train_state(variables["params"], total_steps=10)
    return model, state


def test_checkpoint_roundtrip(trained, tmp_path):
    model, state = trained
    ckpt_dir = str(tmp_path / "ckpts")
    path = save_checkpoint(ckpt_dir, 7, state, model.hyper_parameters)
    assert os.path.exists(os.path.join(path, "hyper_parameters.json"))

    assert find_last_checkpoint(ckpt_dir) == path
    save_checkpoint(ckpt_dir, 12, state, model.hyper_parameters)
    assert find_last_checkpoint(ckpt_dir).endswith("step_12")

    payload, hp = restore_checkpoint(path, state)
    assert payload["step"] == 7
    assert hp["model_class"] == "SingleTaskCompressor"
    for k, v in flatten_dict(state.params).items():
        np.testing.assert_array_equal(
            np.asarray(flatten_dict(payload["params"])[k]), np.asarray(v))


def test_rebuild_model_from_checkpoint(trained, tmp_path):
    model, state = trained
    path = save_checkpoint(str(tmp_path / "c"), 1, state,
                           model.hyper_parameters)
    model2, hp = rebuild_model_from_checkpoint(path)
    assert model2.get_model_name() == model.get_model_name()
    assert model2.tasks == model.tasks
    assert model2.latent_channels == model.latent_channels


def test_cli_train_and_compress_end_to_end(tmp_path):
    """Full user flow: train 4 steps on synthetic data, checkpoint, then
    compress with the checkpoint (both CLIs, CPU)."""
    from mmnc_tpu.cli.train import main as train_main
    from mmnc_tpu.cli.compress import main as compress_main

    out_dir = str(tmp_path / "runs")
    train_main([
        "-d", "synthetic", "-t", "mono", "-m", "1", "-l", "8", "-c", "4",
        "-w", "clitest", "--lmbda", "1e-2", "--epochs", "1",
        "--batch-size", "2", "--train-size", "8", "--val-size", "2",
        "--max-steps", "4", "--no-metrics", "--out-dir", out_dir])

    ckpt = find_last_checkpoint(os.path.join(out_dir, "clitest",
                                             "checkpoints"))
    assert ckpt is not None
    metrics_file = os.path.join(out_dir, "clitest", "clitest.metrics.jsonl")
    lines = [json.loads(l) for l in open(metrics_file)]
    assert any("train/loss" in l for l in lines)
    assert any("val/loss" in l for l in lines)

    actual_bpp, est_bpp = compress_main([
        "-p", ckpt, "-d", "synthetic", "--batch-size", "2",
        "--num-batches", "1"])
    assert actual_bpp > 0 and est_bpp > 0


def test_image_grid_dump(tmp_path):
    from mmnc_tpu.utils.logging import save_image_grid
    rng = np.random.default_rng(0)
    x_hats = {"rgb": rng.random((2, 16, 16, 3)),
              "semantic": rng.random((2, 16, 16, 17))}
    targets = {"rgb": rng.random((2, 16, 16, 3)),
               "semantic": np.floor(rng.random((2, 16, 16, 1)) * 17)}
    save_image_grid(str(tmp_path / "imgs"), x_hats, targets)
    assert os.path.exists(tmp_path / "imgs" / "rgb.png")
    assert os.path.exists(tmp_path / "imgs" / "semantic.png")
