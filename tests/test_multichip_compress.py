"""Data-parallel COMPRESS on a device mesh (inference/serving analog of the
training DP property): the v2 fused compress program must run under a
batch-sharded jit on the simulated 8-device CPU mesh and produce exactly
the single-device symbols/indexes. Parameters are replicated, the batch is
sharded on the data axis — the same layout the training step uses
(parallel/mesh.py), so a fleet of chips can compress a stream with no code
changes and byte-identical bitstreams."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmnc_tpu.models import build_model


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (sim) devices")
def test_sharded_fused_compress_matches_single_device():
    m = build_model(1, ["rgb"], latent_channels=8, conv_channels=4,
                    lmbda=1e-2)
    rng = np.random.default_rng(0)
    batch = {"rgb": jnp.asarray(rng.random((8, 256, 256, 3), np.float32))}
    v = m.init(jax.random.PRNGKey(0), batch)

    ref = jax.device_get(m._compress_device_fused(v, batch))

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    v_repl = jax.device_put(v, NamedSharding(mesh, P()))
    batch_sh = {k: jax.device_put(a, NamedSharding(mesh, P("data")))
                for k, a in batch.items()}
    out = m._compress_device_fused(v_repl, batch_sh)
    assert out[0].sharding.is_equivalent_to(
        NamedSharding(mesh, P("data")), out[0].ndim)
    got = jax.device_get(out)

    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
