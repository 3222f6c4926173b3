"""End-to-end multi-chip training (VERDICT r2 #5): `fit(n_devices=8)` on the
simulated 8-device CPU mesh with an HBM-resident dataset must (a) exercise
the sharded staging branch of the loop (device-resident batches re-staged
through prefetch_to_device when a mesh is active, train/loop.py), and
(b) produce the same loss trace as single-device training for 20+ steps —
the DP == single-device property at the whole-harness level, not just one
step."""

import json
import os

import numpy as np
import jax
import pytest

from mmnc_tpu.data import (SyntheticMultiTaskDataset, BatchLoader,
                           DeviceResidentDataset, prerender)
from mmnc_tpu.models import build_model
from mmnc_tpu.train.loop import fit

TASKS = ["mono"]
STEPS = 20
BATCH = 8  # divisible by the 8-device mesh (1 sample per sim device)


def _loaders(tmp_path):
    # 256px: the legacy geometry's fixed 256x total upsampling means other
    # input sizes cannot reconstruct at input resolution (SURVEY.md §2.4)
    ds = SyntheticMultiTaskDataset(TASKS, size=BATCH * 2, image_size=256,
                                   seed=0)
    pre = prerender(ds, str(tmp_path / "cache"))
    dev = DeviceResidentDataset(pre.arrays)
    assert dev.device_resident
    return (BatchLoader(dev, BATCH, shuffle=True),
            BatchLoader(dev, BATCH, shuffle=False))


def _run(tmp_path, name, n_devices):
    model = build_model(1, TASKS, latent_channels=8, conv_channels=4,
                        lmbda=1e-2, learning_rate_main=1e-3)
    train_loader, val_loader = _loaders(tmp_path)
    state, val_logs = fit(
        model, train_loader, val_loader, epochs=10, run_name=name,
        out_dir=str(tmp_path / "runs"), max_steps=STEPS, log_every=1,
        compute_metrics=False, log_images=False, n_devices=n_devices,
        checkpoint_every_epochs=100, val_every_epochs=100)
    path = tmp_path / "runs" / name / f"{name}.metrics.jsonl"
    trace = {}
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if "train/loss" in rec:
                trace[rec["step"]] = rec["train/loss"]
    return state, val_logs, trace


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (sim) devices")
def test_fit_on_mesh_matches_single_device(tmp_path):
    _, val_single, tr_single = _run(tmp_path, "single", None)
    _, val_mesh, tr_mesh = _run(tmp_path, "mesh", 8)

    assert len(tr_single) >= STEPS - 1 and tr_single.keys() == tr_mesh.keys()
    for step in tr_single:
        np.testing.assert_allclose(
            tr_mesh[step], tr_single[step], rtol=2e-3,
            err_msg=f"loss diverged at step {step}")
    np.testing.assert_allclose(val_mesh["val/loss"], val_single["val/loss"],
                               rtol=2e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (sim) devices")
def test_fit_on_mesh_resumes_from_checkpoint(tmp_path):
    """Mesh training must also round-trip through checkpoint/resume."""
    model = build_model(1, TASKS, latent_channels=8, conv_channels=4,
                        lmbda=1e-2, learning_rate_main=1e-3)
    train_loader, val_loader = _loaders(tmp_path)
    kw = dict(epochs=10, run_name="mesh-resume",
              out_dir=str(tmp_path / "runs"), log_every=10,
              compute_metrics=False, log_images=False, n_devices=8,
              checkpoint_every_epochs=1, val_every_epochs=100, resume=True)
    state1, _ = fit(model, train_loader, val_loader, max_steps=8, **kw)
    state2, _ = fit(model, train_loader, val_loader, max_steps=16, **kw)
    assert int(state2.step) == 16
