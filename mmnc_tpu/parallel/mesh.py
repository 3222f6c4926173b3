"""Device mesh + sharding rules: batch data-parallelism over ICI.

TPU-native replacement for the reference's distributed story (SURVEY.md
§2.3: a hard-pinned SingleDeviceStrategy, so effectively none). These ~5M
parameter codecs need no tensor/pipeline parallelism; the right mapping is
a 1-D "data" mesh with the batch sharded across chips and parameters
replicated. Gradients reduce inside the jit'd step via XLA-inserted psums
riding ICI.

All helpers work identically on a real TPU slice and on the CPU-simulated
mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N).
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim of every array in a task-dict batch."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def shard_train_state(state, mesh: Mesh):
    """Replicate params/opt state across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, sh) if hasattr(x, "shape") else x, state)
