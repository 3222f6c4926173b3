"""Loss subsystem: per-task reconstruction, uncertainty weighting, rate.

Reproduces the reference loss accounting exactly (SURVEY.md §2.4):

* mse/l1: summed over C,H,W, averaged over batch, divided by C — i.e.
  MSE * H * W (src/models/multi_task_compressor.py:223-255).
* cross-entropy: mean over pixels of 17-class CE on dense labels.
* uncertainty weighting (Kendall-style, no 1/2 factor): per task
  exp(-log_var) * loss + log_var, zeroed where the raw loss is 0
  (src/loss_balancing.py:21-54).
* bits-per-pixel: sum(log lik) / -log(2) / num_pixels
  (multi_task_compressor.py:278-293).
* the three variant rate formulas: mixed (mixed_latent.py:70-118),
  disjoint (multi_task_compressor.py:302-357 + disjoint_latent.py:99-115),
  shared (shared_latent.py:118-147).

All tensors NHWC; semantic targets are (B,H,W,1) float class indices and
predictions are (B,H,W,17) logits.
"""

import math
from typing import Dict, Tuple

import jax.numpy as jnp
import optax

_LOG2 = math.log(2.0)


def reconstruction_loss(x_hat, x, loss_type: str):
    x_hat = x_hat.astype(jnp.float32)
    x = x.astype(jnp.float32)
    if loss_type == "mse":
        err = (x - x_hat) ** 2
        return jnp.mean(jnp.sum(err, axis=(1, 2, 3))) / x.shape[-1]
    if loss_type == "l1":
        err = jnp.abs(x - x_hat)
        return jnp.mean(jnp.sum(err, axis=(1, 2, 3))) / x.shape[-1]
    if loss_type == "cross-entropy":
        labels = x[..., 0].astype(jnp.int32)
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(x_hat, labels))
    raise NotImplementedError(f"loss_type {loss_type}")


def uncertainty_weighted_sum(task_losses: Dict[str, jnp.ndarray], log_vars):
    """log_vars: (n_tasks,) in task order; returns scalar weighted sum."""
    losses = jnp.stack(list(task_losses.values()))
    nonzero = (losses != 0.0).astype(losses.dtype)
    weighted = (jnp.exp(-log_vars) * losses + log_vars) * nonzero
    return jnp.sum(weighted)


def multitask_reconstruction_loss(
    batch, x_hats, tasks, loss_types: Dict[str, str], log_vars=None
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    task_losses = {}
    logs = {}
    for task in tasks:
        lt = loss_types[task]
        task_losses[task] = reconstruction_loss(x_hats[task], batch[task], lt)
        logs[f"{task}/{lt}"] = task_losses[task]
    if log_vars is None:
        weighted = sum(task_losses.values())
    else:
        weighted = uncertainty_weighted_sum(task_losses, log_vars)
        for i, task in enumerate(tasks):
            logs[f"uncertainty-weight/{task}"] = log_vars[i]
    return weighted, logs


def bits_per_pixel(likelihoods, num_pixels):
    return jnp.sum(jnp.log(likelihoods)) / (-_LOG2) / num_pixels


def _num_pixels(x_hats, task):
    b, h, w, _ = x_hats[task].shape
    return b * h * w


def compression_loss_mixed(likelihoods, x_hats, tasks):
    """One shared latent: total = (bpp(y) + bpp(z)) / n_tasks; every task
    logs the full bpp(y)+bpp(z)."""
    n_pix = _num_pixels(x_hats, tasks[0])
    y_bpp = bits_per_pixel(likelihoods["y"], n_pix)
    z_bpp = bits_per_pixel(likelihoods["z"], n_pix)
    logs = {f"{t}/compression_loss": y_bpp + z_bpp for t in tasks}
    return (y_bpp + z_bpp) / len(tasks), logs


def compression_loss_disjoint(likelihoods, x_hats, tasks, channels_per_task):
    """Per-task y channel slices; z is shared by all tasks.
    total = (sum_t bpp(y_t) + bpp(z)) / n_tasks."""
    n_pix = _num_pixels(x_hats, tasks[0])
    z_bpp = bits_per_pixel(likelihoods["z"], n_pix)
    total = 0.0
    logs = {}
    for i, task in enumerate(tasks):
        sl = likelihoods["y"][..., i * channels_per_task:(i + 1) * channels_per_task]
        t_bpp = bits_per_pixel(sl, n_pix)
        logs[f"{task}/compression_loss"] = t_bpp + z_bpp
        total += t_bpp
    total = (total + z_bpp) / len(tasks)
    return total, logs


def compression_loss_shared(likelihoods, x_hats, tasks, channels_per_task):
    """Disjoint slices plus one shared slice (the last channel block) whose
    rate is amortized across tasks."""
    total, logs = compression_loss_disjoint(
        likelihoods, x_hats, tasks, channels_per_task)
    n_pix = _num_pixels(x_hats, tasks[0])
    shared = likelihoods["y"][..., -channels_per_task:]
    shared_bpp = bits_per_pixel(shared, n_pix)
    z_bpp = bits_per_pixel(likelihoods["z"], n_pix)
    logs["shared/compression_loss"] = shared_bpp + z_bpp
    total = total + shared_bpp / len(tasks)
    return total, logs
