"""HBM-resident dataset (data/device_cache.py): on-device gather must match
the host loader bit-for-bit up to the uint16 quantization bound, and task
views must share storage."""

import numpy as np
import jax
import jax.numpy as jnp

from mmnc_tpu.data import BatchLoader, DeviceResidentDataset


def _arrays(n=6, hw=16):
    rng = np.random.default_rng(0)
    return {"rgb": rng.random((n, hw, hw, 3), np.float32),
            "depth_euclidean": rng.random((n, hw, hw, 1), np.float32)}


def test_quantized_gather_matches_host_within_bound():
    arrays = _arrays()
    ds = DeviceResidentDataset(arrays)
    idx = [3, 0, 5]
    batch = ds.get_batch(idx)
    for t, a in arrays.items():
        got = np.asarray(batch[t])
        assert got.dtype == np.float32
        np.testing.assert_allclose(got, a[idx], atol=0.5 / 65535 + 1e-7)


def test_unquantized_gather_is_exact():
    arrays = _arrays()
    ds = DeviceResidentDataset(arrays, quantize=False)
    batch = ds.get_batch([1, 4])
    for t, a in arrays.items():
        np.testing.assert_array_equal(np.asarray(batch[t]), a[[1, 4]])


def test_subset_tasks_shares_device_storage():
    ds = DeviceResidentDataset(_arrays())
    view = ds.subset_tasks(["rgb"])
    assert view.tasks == ["rgb"]
    assert view._dev["rgb"] is ds._dev["rgb"]
    assert len(view) == len(ds)


def test_batch_loader_uses_device_fast_path():
    ds = DeviceResidentDataset(_arrays())
    loader = BatchLoader(ds, batch_size=2, shuffle=False)
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    for b in batches:
        for t in ds.tasks:
            assert isinstance(b[t], jax.Array)
            assert b[t].shape[0] == 2
            assert b[t].dtype == jnp.float32


def test_getitem_returns_host_sample():
    arrays = _arrays()
    ds = DeviceResidentDataset(arrays)
    s = ds[2]
    np.testing.assert_allclose(s["rgb"], arrays["rgb"][2],
                               atol=0.5 / 65535 + 1e-7)


def test_out_of_unit_range_tasks_survive_quantization():
    """Semantic class ids (floats 0..16) must not be clipped to 1.0
    (per-task quantization scale)."""
    rng = np.random.default_rng(3)
    sem = np.floor(rng.random((4, 8, 8, 1), np.float32) * 16.99)
    ds = DeviceResidentDataset({"semantic": sem})
    got = np.asarray(ds.get_batch([0, 1, 2, 3])["semantic"])
    np.testing.assert_allclose(got, sem, atol=16.0 * 0.5 / 65535 + 1e-6)
    assert got.max() > 1.5  # clipping would have collapsed everything to 1


def test_signed_data_survives_quantization():
    """Signed values (e.g. [-1,1]-convention normals) must quantize over a
    per-task affine range, not be zeroed below 0 (round-2 advisor finding)."""
    rng = np.random.default_rng(7)
    signed = (rng.random((4, 8, 8, 3), np.float32) * 2.0 - 1.0)
    ds = DeviceResidentDataset({"normal": signed})
    got = np.asarray(ds.get_batch([0, 1, 2, 3])["normal"])
    np.testing.assert_allclose(got, signed, atol=2.0 * 0.5 / 65535 + 1e-6)
    assert got.min() < -0.5  # clipping at 0 would have erased the negatives
