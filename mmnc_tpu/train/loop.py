"""Experiment harness: the epoch loop with validation, checkpointing,
resume, qualitative dumps, and optional profiling.

Replaces the reference's pl.Trainer assembly (src/train.py:288-314,
SURVEY.md L5): per-epoch validation (check_val_every_n_epoch=1), checkpoint
every N epochs carrying hyper_parameters, auto-resume from the latest local
checkpoint (the W&B-artifact flow of utils.py:38-53 made local), image
grids per val epoch (callbacks.py equivalent), and jax.profiler traces on
request — with a background-prefetched input pipeline feeding a fused
jit'd step.
"""

import os
import time
from collections import defaultdict
from typing import Optional

import numpy as np
import jax

from ..parallel import make_mesh, batch_sharding, shard_train_state
from ..utils.checkpoint import (
    save_checkpoint, restore_checkpoint, find_last_checkpoint)
from ..utils.logging import MetricLogger, save_image_grid
from ..data.loader import prefetch_to_device
from .state import create_train_state
from .step import make_train_step, make_eval_step


def _superbatches(it, k: int):
    """Group k consecutive {task: (B,...)} batches into {task: (k,B,...)}
    for the scanned multi-step; drops a trailing incomplete group."""
    group = []
    for batch in it:
        group.append(batch)
        if len(group) == k:
            yield {t: jax.numpy.stack([g[t] for g in group])
                   for t in group[0]}
            group = []


def fit(
    model,
    train_loader,
    val_loader=None,
    epochs: int = 1,
    run_name: str = "run",
    out_dir: str = "runs",
    seed: int = 21,
    resume: bool = False,
    checkpoint_every_epochs: int = 100,
    compute_metrics: bool = True,
    train_metrics: Optional[bool] = None,
    log_images: bool = True,
    use_wandb: bool = False,
    n_devices: Optional[int] = None,
    profile_dir: Optional[str] = None,
    max_steps: Optional[int] = None,
    log_every: int = 10,
    steps_per_call: int = 1,
    val_every_epochs: int = 1,
    extend_schedule: bool = False,
    clip_norm: Optional[float] = None,
    remat: bool = False,
    schedule_total_steps: Optional[int] = None,
):
    """Train `model`; returns (state, last_val_logs)."""
    run_dir = os.path.join(out_dir, run_name)
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    logger = MetricLogger(run_dir, run_name, use_wandb=use_wandb)

    steps_per_epoch = len(train_loader)
    total_steps = min(epochs * steps_per_epoch, max_steps or 10 ** 12)
    if schedule_total_steps is not None:
        # decouple the LR horizon from this invocation's stop point: a
        # staged long run (e.g. 12k -> 28k -> 50k in tiers) re-horizons the
        # cosine ONCE to the final target, so later tiers resume on the
        # SAME schedule instead of warm-restarting at every tier boundary
        total_steps = max(total_steps, schedule_total_steps)

    # a resumed run must keep the ORIGINAL cosine-decay horizon — deriving
    # it from this invocation's --epochs would silently reshape the LR
    # schedule mid-run (the horizon is persisted with every checkpoint)
    last = find_last_checkpoint(ckpt_dir) if resume else None
    if last is not None:
        import json as _json
        with open(os.path.join(last, "hyper_parameters.json")) as f:
            saved_total = _json.load(f).get("total_steps")
        if saved_total is not None and saved_total != total_steps:
            if extend_schedule and total_steps > saved_total:
                # warm-restart extension: re-horizon the cosine decay to the
                # new length (the LR jumps back up — intended, SGDR-style)
                print(f"resume: extending the LR-schedule horizon "
                      f"{saved_total} -> {total_steps} steps")
            else:
                print(f"resume: keeping the original LR-schedule horizon "
                      f"({saved_total} steps, this invocation implies "
                      f"{total_steps})")
                total_steps = saved_total

    rng = jax.random.PRNGKey(seed)
    # keep device-resident batches on device (a D2H roundtrip here costs
    # tens of seconds on this link); host batches go up via jnp.asarray
    init_batch = jax.tree.map(jax.numpy.asarray, next(iter(train_loader)))
    variables = model.init(rng, init_batch)
    state = create_train_state(
        variables["params"], total_steps,
        learning_rate_main=model.learning_rate_main,
        learning_rate_aux=model.learning_rate_aux)

    start_epoch = 0
    if last is not None:
        payload, _ = restore_checkpoint(last, state)
        state = state.replace(step=payload["step"],
                              params=payload["params"],
                              opt_state=payload["opt_state"])
        start_epoch = int(payload["step"]) // steps_per_epoch
        print(f"resumed from {last} (step {payload['step']})")

    use_mesh = n_devices is not None and n_devices > 1
    mesh = make_mesh(n_devices) if use_mesh else None
    sharding = batch_sharding(mesh) if use_mesh else None
    if use_mesh:
        state = shard_train_state(state, mesh)

    # metrics are cheap to skip in the scanned train step (PSNR/MS-SSIM per
    # microstep rival the model's own FLOPs) while the val epoch keeps them
    tm = compute_metrics if train_metrics is None else train_metrics
    if steps_per_call > steps_per_epoch:
        # _superbatches drops trailing incomplete groups; a group larger
        # than the epoch would silently train zero steps per epoch
        print(f"steps_per_call {steps_per_call} > {steps_per_epoch} "
              f"batches/epoch — clamping")
        steps_per_call = steps_per_epoch
    if steps_per_call > 1:
        from .step import make_multi_train_step
        train_step = make_multi_train_step(
            model, steps_per_call, compute_metrics=tm, clip_norm=clip_norm,
            remat=remat)
    else:
        train_step = make_train_step(model, compute_metrics=tm,
                                     clip_norm=clip_norm, remat=remat)
    eval_step = make_eval_step(model, compute_metrics=compute_metrics)

    step_rng = jax.random.PRNGKey(seed + 1)
    last_val_logs = {}
    t_start = time.time()
    done = False
    last_saved_step = -1
    diverged_checks = 0
    _warned_no_loss_key = [False]  # warn once if the guard's keys vanish

    def _save():
        nonlocal last_saved_step
        if int(state.step) != last_saved_step:
            save_checkpoint(ckpt_dir, int(state.step), state,
                            {**model.hyper_parameters,
                             "total_steps": int(total_steps)})
            last_saved_step = int(state.step)

    # SIGTERM (scheduler preemption, `timeout`) -> SystemExit so the
    # interrupt-save below fires; restore the previous handler on exit
    import signal

    def _sigterm(*_):
        raise SystemExit(143)

    prev_handler = None
    try:
        prev_handler = signal.signal(signal.SIGTERM, _sigterm)
    except ValueError:
        pass  # not the main thread

    # device-resident datasets gather batches on-device already; a prefetch
    # queue would only pin extra superbatches in HBM (OOM at big configs)
    def _staged(loader, epoch):
        if (sharding is None and getattr(getattr(loader, "dataset", None),
                                         "device_resident", False)):
            return loader.epoch(epoch)
        return prefetch_to_device(loader.epoch(epoch), sharding=sharding)

    try:
        for epoch in range(start_epoch, epochs):
            if done:
                break
            it = _staged(train_loader, epoch)
            if steps_per_call > 1:
                it = _superbatches(it, steps_per_call)
            for batch in it:
                step_no = int(state.step)
                if profile_dir and step_no == 5:
                    jax.profiler.start_trace(profile_dir)
                state, logs = train_step(state, batch, step_rng)
                if profile_dir and step_no == 10:
                    jax.profiler.stop_trace()
                # pull logs only every log_every steps: device_get forces a
                # host sync, and on a tunneled TPU that RTT dominates small
                # models' step time — in between, steps dispatch async
                if step_no % log_every == 0:
                    host_logs = jax.device_get(logs)
                    logger.log(step_no, host_logs)
                    # divergence guard: a blown-up run (e.g. an SGDR-restart
                    # IGDN explosion, rec_loss ~1e26) never recovers — abort
                    # fast instead of burning the remaining budget. The
                    # caller (sweep) catches, tags the point, moves on.
                    if ("train/loss" not in host_logs
                            and "loss" not in host_logs
                            and not _warned_no_loss_key[0]):
                        _warned_no_loss_key[0] = True
                        print("WARNING: divergence guard found neither "
                              "'train/loss' nor 'loss' in logs — the "
                              "guard is inert for this run")
                    loss_now = float(host_logs.get(
                        "train/loss", host_logs.get("loss", 0.0)) or 0.0)
                    if not np.isfinite(loss_now) or abs(loss_now) > 1e12:
                        diverged_checks += 1
                        if diverged_checks >= 3:
                            raise RuntimeError(
                                f"diverged: train loss {loss_now:.3g} at "
                                f"step {step_no} (3 consecutive checks)")
                    else:
                        diverged_checks = 0
                if max_steps is not None and int(state.step) >= max_steps:
                    done = True
                    break

            run_val = (val_loader is not None
                       and ((epoch + 1) % val_every_epochs == 0
                            or epoch == epochs - 1 or done))
            if run_val:
                acc = defaultdict(list)
                for batch in _staged(val_loader, 0):
                    logs = jax.device_get(eval_step(state.params, batch))
                    for k, v in logs.items():
                        acc[k].append(float(v))
                last_val_logs = {k: float(np.mean(v)) for k, v in acc.items()}
                logger.log(int(state.step), last_val_logs)

                if log_images:
                    # one val batch AND one train batch per val epoch, as
                    # the reference callback does (src/callbacks.py:51-62)
                    for split, loader in (("val", val_loader),
                                          ("train", train_loader)):
                        batch = next(iter(loader.epoch(0)))
                        x_hats, _ = model.forward(
                            {"params": state.params},
                            jax.tree.map(jax.numpy.asarray, batch),
                            training=False)
                        save_image_grid(
                            os.path.join(run_dir,
                                         f"samples_epoch{epoch}_{split}"),
                            jax.tree.map(np.asarray, x_hats), batch)

            if ((epoch + 1) % checkpoint_every_epochs == 0
                    or epoch == epochs - 1 or done):
                _save()
    except (KeyboardInterrupt, SystemExit):
        # interrupt safety: persist the latest weights before exiting
        print("interrupted — saving checkpoint")
        _save()
        raise
    finally:
        if prev_handler is not None:
            signal.signal(signal.SIGTERM, prev_handler)
        dt = time.time() - t_start
        print(f"training done: {int(state.step)} steps in {dt:.1f}s "
              f"({int(state.step) / max(dt, 1e-9):.2f} steps/s)")
        logger.close()
    return state, last_val_logs
