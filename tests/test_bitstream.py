"""Bitstream container round trips (full + partial)."""

import numpy as np
import jax
import pytest

from mmnc_tpu import bitstream
from mmnc_tpu.models import build_model


@pytest.fixture(scope="module")
def setup():
    m = build_model(4, ["rgb", "mono"], latent_channels=12, conv_channels=4,
                    lmbda=1e-2)
    batch = m.example_batch(batch_size=2, image_size=256)
    v = m.init(jax.random.PRNGKey(0), batch)
    tables = m.update_bottleneck_values(v)
    return m, v, tables, batch


def test_full_container_roundtrip(setup, tmp_path):
    m, v, tables, batch = setup
    ans, _ = m.compress(v, tables, batch)
    path = str(tmp_path / "x.mmnc")
    bitstream.save_bitstream(path, ans, m.hyper_parameters)

    loaded, header = bitstream.load_bitstream(path)
    assert header["hyper_parameters"]["model_class"] == m.get_model_name()
    assert loaded["shape"] == ans["shape"]

    out = bitstream.decompress_file(path, m, v, tables)
    ref = m.decompress(v, tables, ans["strings"], ans["shape"],
                       ans["y_shape"], batch_size=ans["batch_size"])
    for t in m.tasks:
        np.testing.assert_allclose(np.asarray(out[t]), np.asarray(ref[t]),
                                   atol=1e-5)


def test_partial_container_subset_decode(setup, tmp_path):
    m, v, tables, batch = setup
    ans, _ = m.compress_partial(v, tables, batch)
    path = str(tmp_path / "p.mmnc")
    bitstream.save_bitstream(path, ans, m.hyper_parameters, partial=True)

    out = bitstream.decompress_file(path, m, v, tables, tasks=["mono"])
    assert set(out.keys()) == {"mono"}

    full_ans, _ = m.compress(v, tables, batch)
    full = m.decompress(v, tables, full_ans["strings"], full_ans["shape"],
                        full_ans["y_shape"], batch_size=full_ans["batch_size"])
    np.testing.assert_allclose(np.asarray(out["mono"]),
                               np.asarray(full["mono"]), atol=1e-5)


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "bad.mmnc"
    p.write_bytes(b"NOPE" + b"\x00" * 16)
    with pytest.raises(AssertionError, match="not an MMNC bitstream"):
        bitstream.load_bitstream(str(p))
