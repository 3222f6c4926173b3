"""Metric sinks and qualitative image dumps.

Observability layer replacing the reference's W&B-only sink (SURVEY.md §5):
scalars go to a JSONL file (+stdout) and optionally to wandb when it is
installed AND explicitly enabled; image sample grids replace the
LogPredictionSamplesCallback (src/callbacks.py:8-62) with PNG dumps of
prediction-vs-target per task each validation epoch.
"""

import json
import os
import time
from typing import Dict

import numpy as np


class MetricLogger:
    def __init__(self, log_dir: str, run_name: str = "run",
                 use_wandb: bool = False, print_every: int = 50):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{run_name}.metrics.jsonl")
        self._f = open(self.path, "a")
        self.print_every = print_every
        self._t0 = time.time()
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb
            except ImportError:
                print("wandb requested but not installed; logging to JSONL only")

    def log(self, step: int, scalars: Dict[str, float]):
        rec = {"step": int(step), "time": time.time() - self._t0}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None and self._wandb.run is not None:
            self._wandb.log(scalars, step=step)
        if self.print_every and step % self.print_every == 0:
            keys = [k for k in ("train/loss", "val/loss", "train/rec_loss",
                                "train/compression_loss", "train/aux_loss")
                    if k in scalars]
            brief = " ".join(f"{k.split('/')[-1]}={scalars[k]:.4g}" for k in keys)
            print(f"[{rec['time']:7.1f}s] step {step}: {brief}")

    def close(self):
        self._f.close()


def _to_uint8(img: np.ndarray) -> np.ndarray:
    return np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)


def save_image_grid(path: str, x_hats: Dict[str, np.ndarray],
                    targets: Dict[str, np.ndarray], max_items: int = 8):
    """Write one PNG per task: top row predictions, bottom row targets
    (the reference callback's 8-sample qualitative dump, callbacks.py:14-42)."""
    from PIL import Image

    os.makedirs(path, exist_ok=True)
    for task, pred in x_hats.items():
        pred = np.asarray(pred)
        targ = np.asarray(targets[task])
        if task == "semantic":
            if pred.shape[-1] > 1:
                pred = np.argmax(pred, -1)[..., None] / 17.0
            targ = targ / 17.0
        n = min(max_items, pred.shape[0])
        p = _to_uint8(pred[:n])
        t = _to_uint8(targ[:n])
        if p.shape[-1] == 1:
            p = np.repeat(p, 3, -1)
            t = np.repeat(t, 3, -1)
        p = p[..., :3]
        t = t[..., :3]
        row_p = np.concatenate(list(p), axis=1)
        row_t = np.concatenate(list(t), axis=1)
        grid = np.concatenate([row_p, row_t], axis=0)
        Image.fromarray(grid).save(os.path.join(path, f"{task}.png"))
