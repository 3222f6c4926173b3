"""Device-resident dataset: the whole training set lives in HBM.

On this box the host cannot feed the chip: a single fancy-indexed batch
gather of the prerendered arrays costs ~2.5 s of host time (throttled
1-vCPU memory subsystem) while the fused train step needs ~124 ms — the
reference's answer (DataLoader worker processes, src/train.py:193-198)
cannot help when the gather itself is host-bound. The TPU-native answer is
to stop touching the data with the host at all: upload the dataset ONCE,
keep it in HBM quantized to uint16 (CLEVR's on-disk sources are 8/16-bit
PNGs, datasets/transforms.py:123-127, so 1/65535 quantization is below the
source precision), and gather+dequantize each batch on-device. Per batch
the host moves only the `batch_size` int32 indices.

At the paper config (4096x256x256 rgb+depth+normal) the cache is ~3.7 GB
of a v5e's 16 GB HBM; fp32 storage (no quantization) is supported for
small datasets.
"""

from functools import partial
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp


_QUANT_LEVELS = 65535.0


@partial(jax.jit, static_argnums=(1, 2))
def _quantize_u16(x, lo, hi):
    return jnp.round(jnp.clip(x, lo, hi) * (_QUANT_LEVELS / (hi - lo))
                     - lo * (_QUANT_LEVELS / (hi - lo))).astype(jnp.uint16)


@partial(jax.jit, static_argnums=(2, 3))
def _gather_dequant_u16(arr, idx, lo, hi):
    return jnp.take(arr, idx, axis=0).astype(jnp.float32) * (
        (hi - lo) / _QUANT_LEVELS) + lo


@jax.jit
def _gather(arr, idx):
    return jnp.take(arr, idx, axis=0)


class DeviceResidentDataset:
    """Task-dict dataset whose arrays live on the accelerator.

    get_batch(indices) returns {task: (B,H,W,C) f32 DEVICE arrays} produced
    by an on-device gather — BatchLoader uses it via its get_batch fast
    path, and prefetch_to_device's device_put is a no-op on the results.

    quantize=True stores uint16 over a per-task affine range
    [min(0, floor(task min)), max(1, ceil(task max))] — so [0,1] image data
    keeps the full 16-bit grid (below the 8/16-bit source precision of the
    CLEVR contract) and out-of-[0,1] tasks on EITHER side (semantic class
    ids 0..16, signed [-1,1] normals) are NOT clipped; quantize=False
    stores the arrays as-is (fp32).
    """

    # loaders/loops use this to skip host-side prefetch queues (each queued
    # superbatch would pin ~1 GB of HBM for zero overlap benefit)
    device_resident = True

    def __init__(self, arrays: Dict[str, np.ndarray], quantize: bool = True,
                 device: Optional[jax.Device] = None):
        sizes = {t: len(a) for t, a in arrays.items()}
        assert len(set(sizes.values())) == 1, f"ragged task arrays: {sizes}"
        self.tasks = list(arrays)
        self.size = next(iter(sizes.values()))
        self.quantize = quantize
        self._dev = {}
        self._scales = {}
        for t, a in arrays.items():
            x = jax.device_put(a, device)
            if quantize and np.issubdtype(np.asarray(a).dtype, np.floating):
                # per-task AFFINE range so values beyond [0,1] — on either
                # side (signed normals, class ids) — survive quantization
                hi = float(max(1.0, np.ceil(float(
                    jax.device_get(jnp.max(x))))))
                lo = float(min(0.0, np.floor(float(
                    jax.device_get(jnp.min(x))))))
                self._scales[t] = (lo, hi)
                x = _quantize_u16(x, lo, hi)
                jax.block_until_ready(x)
                # drop the fp32 upload before staging the next task
                self._dev[t] = x
            else:
                self._dev[t] = x

    def __len__(self):
        return self.size

    def subset_tasks(self, tasks) -> "DeviceResidentDataset":
        """A view over a task subset — shares the device arrays (no copy)."""
        view = object.__new__(DeviceResidentDataset)  # shares device_resident
        view.tasks = list(tasks)
        view.size = self.size
        view.quantize = self.quantize
        view._dev = {t: self._dev[t] for t in tasks}
        view._scales = {t: s for t, s in self._scales.items() if t in tasks}
        return view

    def get_batch(self, indices) -> Dict[str, jax.Array]:
        idx = jnp.asarray(np.asarray(indices, np.int32))
        out = {}
        for t in self.tasks:
            a = self._dev[t]
            if a.dtype == jnp.uint16:
                lo, hi = self._scales[t]
                out[t] = _gather_dequant_u16(a, idx, lo, hi)
            else:
                out[t] = _gather(a, idx)
        return out

    def __getitem__(self, index: int):
        batch = self.get_batch([index])
        return {t: np.asarray(v[0]) for t, v in batch.items()}
