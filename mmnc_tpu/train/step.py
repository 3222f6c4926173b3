"""One fused jit'd train step (and eval step) over an optional device mesh.

Replaces the reference's Lightning manual-optimization step
(src/models/multi_task_compressor.py:420-476): forward, both losses, both
gradient partitions, optimizer update, lr schedule, and train metrics all
compile into a single XLA program. Under a mesh, the batch is sharded along
the "data" axis and XLA inserts the gradient psums over ICI — the TPU-native
replacement for the reference's (never-exercised) NCCL path (SURVEY.md §2.3).
"""

import jax
import jax.numpy as jnp
import optax

from ..ops import metrics as M
from .state import TrainState


def _clip_grads(grads, max_norm):
    """Global-norm gradient clip applied to the raw grads BEFORE the
    optimizer (not as an optax chain stage, so the optimizer-state pytree —
    and therefore every existing checkpoint — keeps its shape). Guards
    warm-restart extensions: re-horizoning the cosine schedule jumps the LR
    back up, which can blow up low-lambda runs (observed: mixed l=0.001
    rec_loss 1e26 within 100 steps of an SGDR restart at 3e-4)."""
    gnorm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(gnorm, 1e-12))
    return jax.tree.map(lambda g: g * scale, grads), gnorm


def _metric_logs(model, batch, x_hats, prefix):
    """Per-task PSNR / MS-SSIM on x255 values (reference average_metrics,
    multi_task_compressor.py:359-384; semantic argmaxed, data_range 17)."""
    logs = {}
    for task in model.tasks:
        pred = x_hats[task]
        target = batch[task]
        if task == "semantic":
            pred = jnp.argmax(pred, axis=-1)[..., None].astype(jnp.float32)
            mult, rng_ = 1.0, 17.0
            logs[f"{prefix}/{task}/miou"] = M.miou(pred[..., 0],
                                                   target[..., 0])
        else:
            mult, rng_ = 255.0, 255.0
        logs[f"{prefix}/{task}/psnr"] = M.psnr(pred * mult, target * mult, rng_)
        logs[f"{prefix}/{task}/ms-ssim"] = M.ms_ssim(
            pred * mult, target * mult, rng_)
    return logs


def make_train_step(model, compute_metrics: bool = True, donate: bool = True,
                    clip_norm=None, remat: bool = False):
    """Returns train_step(state, batch, rng) -> (state, logs), jit'd.

    remat=True wraps the loss in jax.checkpoint (save-nothing policy): the
    backward pass recomputes the forward instead of holding every decoder
    activation. ~1.3x step FLOPs for a several-GB peak-memory cut — the
    4-task shared4 config OOMs a v5e at batch 64 without it (same math;
    updates match the plain step within float tolerance — recomputation
    is not guaranteed bitwise-identical on TPU; see tests/test_train.py)."""

    def loss_fn(params, batch, rng):
        variables = {"params": params}
        main_loss, (logs, x_hats, _) = model.loss_and_logs(
            variables, batch, rng=rng, training=True)
        aux = model.aux_loss(variables)
        logs["aux_loss"] = aux
        return main_loss + aux, (logs, x_hats)

    if remat:
        loss_fn = jax.checkpoint(loss_fn)

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (_, (logs, x_hats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, rng)
        if clip_norm is not None:
            grads, logs["grad_norm"] = _clip_grads(grads, clip_norm)
        state = state.apply_gradients(grads)
        if compute_metrics:
            logs.update(_metric_logs(model, batch, x_hats, "train"))
        logs = {k if "/" in k else f"train/{k}": v for k, v in logs.items()}
        return state, logs

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_multi_train_step(model, steps_per_call: int,
                          compute_metrics: bool = False,
                          donate: bool = True, clip_norm=None,
                          remat: bool = False):
    """K optimizer steps per device dispatch via lax.scan.

    On a dispatch-latency-bound link (tunneled TPU) the per-call round trip
    can rival a small model's compute; scanning K micro-batches inside one
    jit amortizes it K-fold. Takes a super-batch {task: (K, B, H, W, C)};
    returns (state, logs-of-last-microstep). Numerically identical to K
    sequential train_step calls (same per-step rng folding).
    """
    def loss_fn(params, batch, rng):
        variables = {"params": params}
        main_loss, (logs, x_hats, _) = model.loss_and_logs(
            variables, batch, rng=rng, training=True)
        aux = model.aux_loss(variables)
        logs["aux_loss"] = aux
        return main_loss + aux, (logs, x_hats)

    if remat:
        loss_fn = jax.checkpoint(loss_fn)

    def one(state, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        (_, (logs, x_hats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, step_rng)
        if clip_norm is not None:
            grads, logs["grad_norm"] = _clip_grads(grads, clip_norm)
        state = state.apply_gradients(grads)
        if compute_metrics:
            logs.update(_metric_logs(model, batch, x_hats, "train"))
        logs = {k if "/" in k else f"train/{k}": v for k, v in logs.items()}
        return state, logs

    def multi_step(state: TrainState, super_batch, rng):
        def body(state, micro):
            return one(state, micro, rng)
        state, logs_seq = jax.lax.scan(body, state, super_batch,
                                       length=steps_per_call)
        last = jax.tree.map(lambda x: x[-1], logs_seq)
        return state, last

    return jax.jit(multi_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, compute_metrics: bool = True):
    """Returns eval_step(params, batch) -> logs (deterministic rounding)."""

    def eval_step(params, batch):
        variables = {"params": params}
        loss, (logs, x_hats, _) = model.loss_and_logs(
            variables, batch, rng=None, training=False)
        if compute_metrics:
            logs.update(_metric_logs(model, batch, x_hats, "val"))
        logs = {k if "/" in k else f"val/{k}": v for k, v in logs.items()}
        return logs

    return jax.jit(eval_step)
