"""Per-task partial coding: decode a subset of tasks from a subset of the
bitstream (the separable-latent capability the disjoint/shared designs
promise; reference never implements it over real bitstreams)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmnc_tpu.models import build_model


@pytest.fixture(scope="module", params=["disjoint", "shared"])
def setup(request):
    num = {"disjoint": 3, "shared": 4}[request.param]
    m = build_model(num, ["rgb", "mono"], latent_channels=12,
                    conv_channels=4, lmbda=1e-2)
    batch = m.example_batch(batch_size=2, image_size=256)
    v = m.init(jax.random.PRNGKey(0), batch)
    tables = m.update_bottleneck_values(v)
    return m, v, tables, batch


def test_partial_equals_full_decode(setup):
    m, v, tables, batch = setup
    ans, total = m.compress_partial(v, tables, batch)
    assert total > 0
    # every slice (+ shared for model 4) has one stream per batch item
    expected_streams = {s[0] for s in m.variant_slices()}
    assert set(ans["task_streams"].keys()) == expected_streams

    partial = m.decompress_tasks(v, tables, ans, tasks=["mono"])
    assert set(partial.keys()) == {"mono"}

    full_ans, _ = m.compress(v, tables, batch)
    full = m.decompress(v, tables, full_ans["strings"], full_ans["shape"],
                        full_ans["y_shape"], batch_size=full_ans["batch_size"])
    np.testing.assert_allclose(np.asarray(partial["mono"]),
                               np.asarray(full["mono"]), atol=1e-5)


def test_partial_bytes_smaller_than_total(setup):
    m, v, tables, batch = setup
    ans, total = m.compress_partial(v, tables, batch)
    mono_bytes = sum(len(s) for s in ans["task_streams"]["mono"])
    z_bytes = sum(len(s) for s in ans["z_strings"])
    shared_bytes = (sum(len(s) for s in ans["task_streams"]["shared"])
                    if "shared" in ans["task_streams"] else 0)
    needed = mono_bytes + z_bytes + shared_bytes
    assert needed < total, "subset decode must need fewer bytes than all"


def test_miou_metric():
    from mmnc_tpu.ops.metrics import miou
    pred = jnp.asarray([[0, 1], [2, 2]])
    tgt = jnp.asarray([[0, 1], [2, 3]])
    # classes present in target: 0 (iou 1), 1 (iou 1), 2 (iou 1/2), 3 (0)
    v = float(miou(pred, tgt, num_classes=4))
    np.testing.assert_allclose(v, (1 + 1 + 0.5 + 0) / 4, atol=1e-6)

    perfect = float(miou(tgt, tgt, num_classes=4))
    np.testing.assert_allclose(perfect, 1.0, atol=1e-6)
