"""Analysis toolkit: the reference's plots.ipynb / check_bpp.ipynb
capabilities as a library (SURVEY.md C16/C17).

* RD-curve extraction from metric JSONL logs + plotting
* classical-codec baselines: JPEG/WebP quality bisection to a target bpp
  (plots.ipynb cells 1-3)
* per-channel bpp attribution with task-slice boundaries
  (plots.ipynb cells 9, 47-51)
* latent-probing: swap latent channel slices between samples / average
  channels and observe reconstructions (plots.ipynb cells 52-81)
* check_bpp: actual rANS bytes vs likelihood estimate for a trained model
  (check_bpp.ipynb as a function)
"""

import io
import json
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# --- RD curves -------------------------------------------------------------

def load_metrics(jsonl_path: str) -> List[dict]:
    with open(jsonl_path) as f:
        return [json.loads(line) for line in f if line.strip()]


def final_rd_point(jsonl_path: str, tasks: Sequence[str],
                   prefix: str = "val") -> dict:
    """Last logged validation entry -> {bpp, psnr/<task>, ms-ssim/<task>}."""
    records = [r for r in load_metrics(jsonl_path)
               if f"{prefix}/compression_loss" in r]
    if not records:
        raise ValueError(f"no {prefix} records in {jsonl_path}")
    r = records[-1]
    out = {"step": r["step"], "bpp": r[f"{prefix}/compression_loss"]}
    for t in tasks:
        for m in ("psnr", "ms-ssim"):
            key = f"{prefix}/{t}/{m}"
            if key in r:
                out[f"{t}/{m}"] = r[key]
    return out


def plot_rd_curves(points_by_model: Dict[str, List[dict]], task: str,
                   metric: str = "psnr", out_path: Optional[str] = None):
    """points_by_model: {label: [rd_point, ...]}; saves/returns a figure."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    for label, pts in points_by_model.items():
        pts = sorted(pts, key=lambda p: p["bpp"])
        xs = [p["bpp"] for p in pts]
        ys = [p[f"{task}/{metric}"] for p in pts]
        ax.plot(xs, ys, marker="o", label=label)
    ax.set_xlabel("bpp")
    ax.set_ylabel(f"{task} {metric}")
    ax.legend()
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=150)
    return fig


# --- classical baselines ---------------------------------------------------

def classical_codec_rd(image: np.ndarray, target_bpp: float,
                       codec: str = "JPEG", tol: float = 0.01,
                       max_iter: int = 20) -> Tuple[np.ndarray, float, int]:
    """Bisect the quality setting of JPEG/WebP to hit a target bpp.

    image: (H, W, 3) float [0,1]. Returns (decoded [0,1], achieved_bpp,
    quality). Mirrors the JPEG/WebP baseline cells of plots.ipynb.
    """
    from PIL import Image

    h, w = image.shape[:2]
    img = Image.fromarray(
        np.clip(image * 255.0, 0, 255).astype(np.uint8))

    lo, hi = 1, 100
    best = None
    for _ in range(max_iter):
        q = (lo + hi) // 2
        buf = io.BytesIO()
        img.save(buf, format=codec, quality=q)
        bpp = buf.tell() * 8 / (h * w)
        best = (buf, bpp, q)
        if abs(bpp - target_bpp) < tol:
            break
        if bpp > target_bpp:
            hi = q - 1
        else:
            lo = q + 1
        if lo > hi:
            break
    buf, bpp, q = best
    buf.seek(0)
    decoded = np.asarray(Image.open(buf).convert("RGB"), np.float32) / 255.0
    return decoded, bpp, q


# --- learned-codec baseline --------------------------------------------------

def learned_baseline_rd(checkpoint_paths: Sequence[str], batch=None,
                        batch_size: int = 16, image_size: int = 256,
                        seed: int = 21, n_images: int = 256,
                        data_style: str = "legacy") -> List[dict]:
    """RD points of trained checkpoints, for overlay on RD plots.

    The reference compares its multi-task codecs against a pretrained
    single-task RGB ScaleHyperprior (plots.ipynb cell 5's
    bmshj2018_hyperprior, evaluated across the val set). No pretrained zoo
    exists here, so the stand-in baseline is any trained single-task
    checkpoint (e.g. the rd_paper sweep's single-rgb runs). Each point
    carries the ACTUAL packed-bitstream bpp and per-task PSNR/MS-SSIM
    averaged over `n_images` held-out images (batched by `batch_size`);
    pass an explicit `batch` to evaluate on exactly that one batch instead.
    """
    from .utils.checkpoint import (rebuild_model_from_checkpoint,
                                   restore_checkpoint)
    from .train.state import create_train_state
    from .ops import metrics as M

    points = []
    for path in checkpoint_paths:
        model, hp = rebuild_model_from_checkpoint(path)
        variables = model.init(jax.random.PRNGKey(0),
                               model.example_batch(image_size=image_size))
        state = create_train_state(variables["params"], 1)
        payload, _ = restore_checkpoint(path, state)
        variables = {"params": payload["params"]}
        tables = model.update_bottleneck_values(variables)

        if batch is None:
            from .data import SyntheticMultiTaskDataset, BatchLoader
            ds = SyntheticMultiTaskDataset(model.tasks, size=n_images,
                                           image_size=image_size,
                                           seed=10 ** 6, style=data_style)
            batches = list(BatchLoader(ds, batch_size, shuffle=False))
            batches = [jax.tree.map(jnp.asarray, b) for b in batches]
        else:
            batches = [{t: jnp.asarray(batch[t]) for t in model.tasks}]

        # average the RD point over every batch (plots.ipynb cell 5
        # evaluates its baseline across the val set, not one batch)
        acc = {}
        n_seen = 0
        for eval_batch in batches:
            bsz = eval_batch[model.tasks[0]].shape[0]
            p = check_bpp(model, variables, tables, eval_batch)
            x_hats, _ = model.forward(variables, eval_batch, training=False)
            for t in model.tasks:
                p[f"{t}/psnr"] = float(M.psnr(
                    x_hats[t] * 255.0, eval_batch[t] * 255.0, 255.0))
                p[f"{t}/ms-ssim"] = float(M.ms_ssim(
                    x_hats[t] * 255.0, eval_batch[t] * 255.0, 255.0))
            for k, v in p.items():
                if isinstance(v, (int, float)):
                    acc[k] = acc.get(k, 0.0) + float(v) * bsz
            n_seen += bsz
        point = {k: v / n_seen for k, v in acc.items()}
        point["bpp"] = point["actual_bpp"]
        point["n_images"] = n_seen
        point["checkpoint"] = path
        point["lmbda"] = hp.get("lmbda")
        points.append(point)
    return points


# --- latent attribution & probing -----------------------------------------

def channel_bpp(model, variables, batch) -> Dict[str, np.ndarray]:
    """Per-channel mean bpp of the y and z latents (deterministic eval).

    Returns {"y": (M,), "z": (N,), "task_slices": [(task, lo, hi), ...]}.
    The task_slices annotate which y channels belong to which task for the
    disjoint/shared variants (plots.ipynb channel-attribution cells).
    """
    _, lik = model.forward(variables, batch, training=False)
    b, h, w, _ = batch[model.tasks[0]].shape
    n_pix = b * h * w
    out = {}
    for name in ("y", "z"):
        bits = -np.log2(np.asarray(lik[name]))
        out[name] = bits.sum(axis=(0, 1, 2)) / n_pix
    slices = []
    if model.variant_slices() is not None:
        slices = model.variant_slices()
    out["task_slices"] = slices
    return out


def swap_latent_slices(model, variables, batch_a, batch_b,
                       channels: Sequence[int]):
    """Decode batch_a with the given y channels replaced by batch_b's.

    The shared-latent probing experiment (plots.ipynb cells 52-81): shows
    which tasks' reconstructions change when a latent slice is swapped.
    Returns {task: reconstruction} for the hybrid latent.
    """
    ya, za = model.encode_eval(variables, batch_a)
    yb, _ = model.encode_eval(variables, batch_b)
    y_hybrid = np.asarray(ya).copy()
    y_hybrid[..., list(channels)] = np.asarray(yb)[..., list(channels)]
    return model.decode_from_latents(variables, jnp.asarray(y_hybrid), za)


def average_channels(model, variables, batch, channels: Sequence[int]):
    """Replace the given y channels with their batch mean before decoding
    (the channel-averaging ablation of plots.ipynb)."""
    y, z = model.encode_eval(variables, batch)
    y = np.asarray(y).copy()
    y[..., list(channels)] = y[..., list(channels)].mean(
        axis=0, keepdims=True)
    return model.decode_from_latents(variables, jnp.asarray(y), z)


# --- check_bpp -------------------------------------------------------------

def check_bpp(model, variables, tables, batch) -> dict:
    """Actual rANS bytes vs likelihood-estimated bpp (check_bpp.ipynb).

    Reports BOTH estimates: the training-geometry one (which under the
    reference's default legacy broadcast 16x-overcounts a saturated y
    latent, SURVEY.md §2.4 — kept, labeled, for parity with the training
    logs) and the corrected-geometry one, which is the like-for-like
    comparator for the real bitstream (multi_task_compressor.py:520-532)."""
    ans, n_bytes = model.compress(variables, tables, batch)
    b, h, w, _ = batch[model.tasks[0]].shape  # no D2H just for the shape
    actual = n_bytes * 8 / (b * h * w * model.n_tasks)
    _, lik = model.forward(variables, batch, training=False)
    est, _ = model._compression_loss(lik, batch)
    twin = model.corrected_geometry_twin()
    _, lik_c = twin.forward(variables, batch, training=False)
    est_c, _ = twin._compression_loss(lik_c, batch)
    return {"actual_bpp": float(actual),
            "estimated_bpp": float(est_c),
            "estimated_bpp_legacy": float(est),
            "bytes": int(n_bytes)}
