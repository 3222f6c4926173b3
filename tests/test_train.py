"""Training subsystem tests: fused two-optimizer step, overfit smoke, and
data-parallel mesh equivalence (SURVEY.md §4's implied test pyramid)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax.traverse_util import flatten_dict

from mmnc_tpu.models import build_model
from mmnc_tpu.train import create_train_state, make_train_step, make_eval_step
from mmnc_tpu.train.state import param_partition
from mmnc_tpu.parallel import make_mesh, shard_batch, shard_train_state
from mmnc_tpu.data import SyntheticMultiTaskDataset, BatchLoader


@pytest.fixture(scope="module")
def setup():
    model = build_model(1, ["mono"], latent_channels=8, conv_channels=4,
                        lmbda=1e-2, learning_rate_main=1e-3)
    ds = SyntheticMultiTaskDataset(["mono"], size=4, image_size=256)
    batch = next(iter(BatchLoader(ds, batch_size=2, shuffle=False)))
    variables = model.init(jax.random.PRNGKey(0),
                           jax.tree.map(jnp.asarray, batch))
    return model, batch, variables


def test_param_partition_labels(setup):
    model, batch, variables = setup
    labels = flatten_dict(param_partition(variables["params"]))
    n_aux = sum(1 for v in labels.values() if v == "aux")
    assert n_aux == 1  # exactly the EB quantiles
    for k, v in labels.items():
        assert v == ("aux" if k[-1] == "quantiles" else "main")


def test_quantiles_only_updated_by_aux(setup):
    """After one step, quantiles must move only due to the aux loss and
    density params must not receive aux gradients (the reference's strict
    optimizer split, multi_task_compressor.py:389-418)."""
    model, batch, variables = setup
    state = create_train_state(variables["params"], total_steps=10,
                               learning_rate_main=1e-3)
    step = make_train_step(model, compute_metrics=False, donate=False)
    new_state, logs = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(logs["train/loss"]))
    assert float(logs["train/aux_loss"]) > 0
    q0 = variables["params"]["compressor"]["entropy_bottleneck"]["quantiles"]
    q1 = new_state.params["compressor"]["entropy_bottleneck"]["quantiles"]
    assert not np.allclose(np.asarray(q0), np.asarray(q1))


def test_overfit_single_batch_loss_decreases(setup):
    """The reference's local smoke-test crutch (train.py:191 Subset) as a
    real test: a few steps on one batch must reduce the loss."""
    model, batch, variables = setup
    state = create_train_state(variables["params"], total_steps=30,
                               learning_rate_main=1e-3)
    step = make_train_step(model, compute_metrics=False, donate=False)
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(8):
        state, logs = step(state, batch, rng)
        losses.append(float(logs["train/loss"]))
    assert losses[-1] < losses[0], losses
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


def test_eval_step_runs_and_logs(setup):
    model, batch, variables = setup
    eval_step = make_eval_step(model, compute_metrics=True)
    logs = eval_step(variables["params"], batch)
    assert "val/loss" in logs and "val/mono/psnr" in logs
    assert np.isfinite(float(logs["val/mono/psnr"]))


def test_data_parallel_step_matches_single_device(setup):
    """One step on an 8-device mesh (batch sharded, params replicated) must
    produce the same new params as the unsharded step."""
    model, batch, variables = setup
    big_batch = {k: np.concatenate([v] * 4) for k, v in batch.items()}  # B=8

    step = make_train_step(model, compute_metrics=False, donate=False)
    s0 = create_train_state(variables["params"], total_steps=10,
                            learning_rate_main=1e-3)
    ref_state, ref_logs = step(s0, big_batch, jax.random.PRNGKey(0))

    mesh = make_mesh(8)
    s1 = create_train_state(variables["params"], total_steps=10,
                            learning_rate_main=1e-3)
    s1 = shard_train_state(s1, mesh)
    sharded = shard_batch(big_batch, mesh)
    dp_state, dp_logs = step(s1, sharded, jax.random.PRNGKey(0))

    # f32 reduction order differs across shards; allow a few ulps of slack
    np.testing.assert_allclose(float(dp_logs["train/loss"]),
                               float(ref_logs["train/loss"]), rtol=1e-4)
    ref_flat = flatten_dict(ref_state.params)
    dp_flat = flatten_dict(dp_state.params)
    for k in ref_flat:
        np.testing.assert_allclose(
            np.asarray(dp_flat[k]), np.asarray(ref_flat[k]),
            rtol=2e-4, atol=2e-6, err_msg=str(k))


def test_cosine_schedule_endpoints():
    from mmnc_tpu.train.state import create_train_state
    import optax
    sched = optax.cosine_decay_schedule(1e-4, 100, alpha=1e-8 / 1e-4)
    assert float(sched(0)) == pytest.approx(1e-4)
    assert float(sched(100)) == pytest.approx(1e-8, rel=1e-3)


def test_synthetic_dataset_tasks_and_ranges():
    ds = SyntheticMultiTaskDataset(
        ["rgb", "depth_euclidean", "normal", "semantic", "mono"],
        size=4, image_size=64)
    s = ds[0]
    assert s["rgb"].shape == (64, 64, 3)
    assert s["depth_euclidean"].shape == (64, 64, 1)
    assert s["normal"].shape == (64, 64, 3)
    assert s["semantic"].shape == (64, 64, 1)
    labels = np.unique(s["semantic"])
    assert labels.min() >= 0 and labels.max() <= 16
    # determinism
    s2 = ds[0]
    np.testing.assert_array_equal(s["rgb"], s2["rgb"])
    # alignment: objects visible in rgb are where semantic > 0
    assert (s["semantic"] > 0).any()


def test_batch_loader_shapes_and_drop_last():
    ds = SyntheticMultiTaskDataset(["mono"], size=5, image_size=32)
    loader = BatchLoader(ds, batch_size=2, shuffle=True)
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    assert batches[0]["mono"].shape == (2, 32, 32, 1)


def test_multi_step_scan_matches_sequential(setup):
    """K scanned micro-steps in one dispatch == K sequential train steps."""
    from mmnc_tpu.train import make_multi_train_step

    model, batch, variables = setup
    k = 3
    rng = jax.random.PRNGKey(9)
    micro = [jax.tree.map(lambda x, s=s: x + 0.01 * s, batch)
             for s in range(k)]

    seq_state = create_train_state(variables["params"], total_steps=20,
                                   learning_rate_main=1e-3)
    step = make_train_step(model, compute_metrics=False, donate=False)
    for i in range(k):
        seq_state, seq_logs = step(seq_state, micro[i], rng)

    multi_state = create_train_state(variables["params"], total_steps=20,
                                     learning_rate_main=1e-3)
    multi = make_multi_train_step(model, steps_per_call=k, donate=False)
    super_batch = {t: np.stack([m[t] for m in micro]) for t in batch}
    multi_state, multi_logs = multi(multi_state, super_batch, rng)

    assert int(multi_state.step) == int(seq_state.step) == k
    np.testing.assert_allclose(float(multi_logs["train/loss"]),
                               float(seq_logs["train/loss"]), rtol=1e-5)
    for key, v in flatten_dict(seq_state.params).items():
        np.testing.assert_allclose(
            np.asarray(flatten_dict(multi_state.params)[key]),
            np.asarray(v), rtol=1e-4, atol=1e-6, err_msg=str(key))


def test_fit_clamps_steps_per_call_to_epoch_length(tmp_path):
    """steps_per_call > batches/epoch must not silently train 0 steps
    (the _superbatches grouping drops incomplete groups)."""
    from mmnc_tpu.train.loop import fit

    model = build_model(1, ["mono"], latent_channels=8, conv_channels=4,
                        lmbda=1e-2, learning_rate_main=1e-3)
    ds = SyntheticMultiTaskDataset(["mono"], size=4, image_size=256)
    loader = BatchLoader(ds, batch_size=2, shuffle=False)  # 2 batches/epoch
    state, _ = fit(model, loader, val_loader=None, epochs=1,
                   run_name="clamp", out_dir=str(tmp_path),
                   compute_metrics=False, log_images=False,
                   steps_per_call=8, log_every=100)
    assert int(state.step) == 2


def test_grad_clip_bounds_update_and_logs_norm(setup):
    """clip_norm: huge threshold == unclipped step exactly; tiny threshold
    must shrink the parameter update; train/grad_norm is logged."""
    model, batch, variables = setup

    def one(clip):
        s = create_train_state(variables["params"], total_steps=10,
                               learning_rate_main=1e-3)
        step = make_train_step(model, compute_metrics=False, donate=False,
                               clip_norm=clip)
        return step(s, batch, jax.random.PRNGKey(0))

    s_none, logs_none = one(None)
    s_big, logs_big = one(1e9)
    assert "train/grad_norm" not in logs_none
    gnorm = float(logs_big["train/grad_norm"])
    assert np.isfinite(gnorm) and gnorm > 0
    for k, v in flatten_dict(s_none.params).items():
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(flatten_dict(s_big.params)[k]),
            err_msg=str(k))

    # a tiny clip must leave params closer to their initial values than an
    # unclipped step does (Adam renormalizes, so compare total movement)
    s_tiny, _ = one(gnorm * 1e-6)
    p0 = flatten_dict(variables["params"])
    moved_tiny = sum(float(np.abs(np.asarray(v) - np.asarray(p0[k])).sum())
                     for k, v in flatten_dict(s_tiny.params).items())
    moved_none = sum(float(np.abs(np.asarray(v) - np.asarray(p0[k])).sum())
                     for k, v in flatten_dict(s_none.params).items())
    assert moved_tiny < moved_none


def test_fit_divergence_guard_aborts(tmp_path):
    """A run whose loss blows up must abort with 'diverged' instead of
    training (and checkpointing) garbage to the end of the budget."""
    from mmnc_tpu.train.loop import fit
    from mmnc_tpu.data import SyntheticMultiTaskDataset, BatchLoader

    model = build_model(1, ["mono"], latent_channels=8, conv_channels=4,
                        lmbda=1e-2, learning_rate_main=1e7)  # guaranteed blowup
    ds = SyntheticMultiTaskDataset(["mono"], size=4, image_size=256)
    loader = BatchLoader(ds, batch_size=2, shuffle=False)
    with pytest.raises(RuntimeError, match="diverged"):
        fit(model, loader, None, epochs=50, run_name="diverge",
            out_dir=str(tmp_path), compute_metrics=False, log_images=False,
            log_every=1, checkpoint_every_epochs=1000)


def test_extend_schedule_spikes_lr_on_resume(tmp_path, capsys):
    """SGDR-restart hazard regression (DESIGN.md round 3/4): resuming with
    extend_schedule=True re-horizons the cosine decay, which jumps the LR
    back toward peak at the resume step. That spike is the mechanism that
    blew up mixed-l0.001 (normal-head mse 1e26); the sweep therefore pairs
    --extend with clip_norm=5.0. This pins the schedule semantics: without
    extend the horizon is preserved (no spike), with extend the LR at the
    resume step is restored to near-peak."""
    import optax
    from mmnc_tpu.train.loop import fit
    from mmnc_tpu.data import SyntheticMultiTaskDataset, BatchLoader

    def cosine_schedule(peak, total_steps):
        # same construction as train.state.create_train_state
        return optax.cosine_decay_schedule(
            init_value=peak, decay_steps=total_steps, alpha=1e-8 / peak)

    model = build_model(1, ["mono"], latent_channels=8, conv_channels=4,
                        lmbda=1e-2, learning_rate_main=1e-4)
    ds = SyntheticMultiTaskDataset(["mono"], size=4, image_size=256)
    loader = BatchLoader(ds, batch_size=2, shuffle=False)

    # phase 1: 8-step horizon, trained to completion + checkpointed
    fit(model, loader, None, epochs=4, run_name="sgdr", out_dir=str(tmp_path),
        compute_metrics=False, log_images=False, log_every=100,
        checkpoint_every_epochs=1, max_steps=8)

    old = cosine_schedule(1e-4, total_steps=8)
    new = cosine_schedule(1e-4, total_steps=80)
    # at step 8 the original schedule has decayed to ~0 (eta_min regime);
    # the re-horizoned one is back near peak — that's the spike
    assert float(old(8)) < 1e-5
    assert float(new(8)) > 5e-5

    # phase 2a: resume WITHOUT extend — horizon must be preserved
    fit(model, loader, None, epochs=40, run_name="sgdr",
        out_dir=str(tmp_path), resume=True, compute_metrics=False,
        log_images=False, log_every=100, checkpoint_every_epochs=1000,
        max_steps=80)
    kept = capsys.readouterr().out
    assert "keeping the original LR-schedule horizon" in kept

    # phase 2b: resume WITH extend — horizon re-set (the spike path)
    fit(model, loader, None, epochs=40, run_name="sgdr",
        out_dir=str(tmp_path), resume=True, extend_schedule=True,
        compute_metrics=False, log_images=False, log_every=100,
        checkpoint_every_epochs=1000, max_steps=80, clip_norm=5.0)
    extended = capsys.readouterr().out
    assert "extending the LR-schedule horizon 8 -> 80" in extended


def test_remat_matches_plain_step(setup):
    """remat=True (jax.checkpoint around the loss) must be a pure
    memory/FLOPs trade: parameter updates and logged losses identical to
    the plain step. Guards the shared4-OOM escape hatch (the 4-task
    flagship config exhausts v5e HBM at batch 64 without it)."""
    model, batch, variables = setup
    out = {}
    for remat in (False, True):
        state = create_train_state(variables["params"], total_steps=10,
                                   learning_rate_main=1e-3)
        step = make_train_step(model, compute_metrics=False, donate=False,
                               clip_norm=5.0, remat=remat)
        for _ in range(2):
            state, logs = step(state, batch, jax.random.PRNGKey(2))
        out[remat] = (state.params, float(logs["train/loss"]))
    assert out[False][1] == pytest.approx(out[True][1], rel=1e-6)
    flat_a = flatten_dict(out[False][0])
    flat_b = flatten_dict(out[True][0])
    for k in flat_a:
        np.testing.assert_allclose(np.asarray(flat_a[k]),
                                   np.asarray(flat_b[k]), rtol=1e-6,
                                   atol=1e-7, err_msg="/".join(k))
