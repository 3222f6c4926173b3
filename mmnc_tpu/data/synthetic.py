"""Procedural multi-task dataset: aligned rgb / depth / normal / semantic.

Capability stand-in for Taskonomized CLEVR (reference C12) that needs no
downloads: each index renders a deterministic scene of colored primitives
(spheres and boxes on a ground plane) and derives every modality from the
same geometry, so the cross-task structure the multi-task codecs exploit is
real. Used by tests, the training-demo CLI, and the benchmark.

Conventions match the reference data pipeline (SURVEY.md C12-C14):
float32 NHWC in [0,1]; depth_euclidean is 1-channel; normal is 3-channel
in [0,1] (n/2+0.5); semantic is 1-channel float class indices 0..16;
mono is 1-channel grayscale.
"""

from typing import Sequence

import numpy as np

_ALL_TASKS = ("rgb", "depth_euclidean", "normal", "semantic", "mono")


class SyntheticMultiTaskDataset:
    def __init__(self, tasks: Sequence[str], size: int = 1024,
                 image_size: int = 256, seed: int = 0):
        for t in tasks:
            assert t in _ALL_TASKS, f"unknown task {t}"
        self.tasks = list(tasks)
        self.size = size
        self.image_size = image_size
        self.seed = seed

    def __len__(self):
        return self.size

    def _render(self, index: int):
        n = self.image_size
        rng = np.random.default_rng((self.seed << 20) + index)

        yy, xx = np.mgrid[0:n, 0:n].astype(np.float32) / n

        # ground plane: depth grows toward the top of the image
        depth = 0.55 + 0.4 * (1.0 - yy)
        normal = np.zeros((n, n, 3), np.float32)
        normal[..., 1] = 0.85   # up-facing ground
        normal[..., 2] = 0.53
        base = 0.25 + 0.15 * rng.random()
        rgb = np.stack([np.full((n, n), base + 0.05 * c, np.float32)
                        for c in range(3)], -1)
        rgb *= (0.8 + 0.4 * yy)[..., None]
        sem = np.zeros((n, n), np.float32)

        n_obj = rng.integers(3, 8)
        for _ in range(n_obj):
            cx, cy = rng.random(2) * 0.8 + 0.1
            r = 0.05 + 0.12 * rng.random()
            color = rng.random(3) * 0.8 + 0.2
            z = 0.2 + 0.6 * rng.random()
            kind = rng.integers(0, 2)
            if kind == 0:  # sphere
                d2 = ((xx - cx) ** 2 + (yy - cy) ** 2) / (r ** 2)
                mask = d2 < 1.0
                h = np.sqrt(np.clip(1.0 - d2, 0, 1))
                obj_depth = z - 0.1 * h * r
                nx = (xx - cx) / r
                ny = (yy - cy) / r
                obj_n = np.stack([nx, ny, h], -1)
                obj_n /= np.maximum(
                    np.linalg.norm(obj_n, axis=-1, keepdims=True), 1e-6)
                cls = 1 + int(rng.integers(0, 8))
            else:  # axis-aligned box
                w_, h_ = r, r * (0.5 + rng.random())
                mask = (np.abs(xx - cx) < w_) & (np.abs(yy - cy) < h_)
                obj_depth = np.full((n, n), z, np.float32)
                obj_n = np.zeros((n, n, 3), np.float32)
                obj_n[..., 2] = 1.0
                cls = 9 + int(rng.integers(0, 8))

            vis = mask & (obj_depth < depth)
            depth = np.where(vis, obj_depth, depth)
            shade = 0.6 + 0.4 * (1 - z)
            for c in range(3):
                rgb[..., c] = np.where(vis, color[c] * shade, rgb[..., c])
            for c in range(3):
                normal[..., c] = np.where(vis, obj_n[..., c], normal[..., c])
            sem = np.where(vis, float(cls), sem)

        out = {
            "rgb": np.clip(rgb, 0, 1),
            "depth_euclidean": depth[..., None],
            "normal": np.clip(normal * 0.5 + 0.5, 0, 1),
            "semantic": sem[..., None],
            "mono": np.clip(rgb.mean(-1, keepdims=True), 0, 1),
        }
        return out

    def __getitem__(self, index: int):
        scene = self._render(index)
        return {t: scene[t].astype(np.float32) for t in self.tasks}
