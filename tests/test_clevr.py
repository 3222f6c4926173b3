"""CLEVR loader tests against a generated on-disk fixture matching the
reference file scheme (src/datasets/clevr.py:52-57, SURVEY.md C12/C14)."""

import os

import numpy as np
import pytest
from PIL import Image

from mmnc_tpu.data.clevr import CLEVRDataset
from mmnc_tpu.data.task_configs import SEM_CLASSES, task_parameters


@pytest.fixture(scope="module")
def clevr_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("clevr")
    rng = np.random.default_rng(0)
    for i in range(2):
        # rgb: 8-bit RGB 512px (resized to 256 by the loader)
        d = root / "rgb" / "val"
        d.mkdir(parents=True, exist_ok=True)
        rgb = rng.integers(0, 255, (512, 512, 3), dtype=np.uint8)
        Image.fromarray(rgb).save(d / f"point_{i}_view_0_domain_rgb.png")

        # depth_euclidean: 16-bit grayscale
        d = root / "depth_euclidean" / "val"
        d.mkdir(parents=True, exist_ok=True)
        depth = rng.integers(0, 8000, (512, 512), dtype=np.uint16)
        Image.fromarray(depth, mode="I;16").save(
            d / f"point_{i}_view_0_domain_depth_euclidean.png")

        # semantic: 3-channel label image, classes in G channel
        d = root / "semantic" / "val"
        d.mkdir(parents=True, exist_ok=True)
        sem = np.zeros((512, 512, 3), np.uint8)
        sem[..., 1] = rng.choice(np.asarray(SEM_CLASSES, np.uint8),
                                 size=(512, 512))
        Image.fromarray(sem).save(d / f"point_{i}_view_0_domain_semantic.png")
    return str(root)


def test_clevr_shapes_and_ranges(clevr_root):
    ds = CLEVRDataset(clevr_root, ["rgb", "depth_euclidean", "semantic"],
                      split="val", image_size=256)
    s = ds[0]
    assert s["rgb"].shape == (256, 256, 3)
    assert s["rgb"].dtype == np.float32
    assert 0 <= s["rgb"].min() and s["rgb"].max() <= 1.0

    assert s["depth_euclidean"].shape == (256, 256, 1)
    # 16-bit scaled by 1/(2^15-1) then clamp-rescaled by 8000/(2^15-1)
    assert s["depth_euclidean"].max() <= 1.0 + 1e-5

    assert s["semantic"].shape == (256, 256, 1)
    labels = np.unique(s["semantic"])
    assert labels.min() >= 0 and labels.max() <= len(SEM_CLASSES) - 1
    assert np.allclose(labels, np.round(labels)), "dense class indices"


def test_clevr_semantic_remap_exact(clevr_root):
    """Raw G-channel class ids must land on their SEM_CLASSES index."""
    ds = CLEVRDataset(clevr_root, ["semantic"], split="val", image_size=512)
    s = ds[1]["semantic"][..., 0]
    raw = np.asarray(Image.open(os.path.join(
        clevr_root, "semantic", "val",
        "point_1_view_0_domain_semantic.png")))[..., 1]
    lut = {cls: i for i, cls in enumerate(SEM_CLASSES)}
    want = np.vectorize(lut.get)(raw)
    np.testing.assert_array_equal(s.astype(int), want)


def test_clevr_split_sizes(clevr_root):
    assert len(CLEVRDataset(clevr_root, ["rgb"], "train")) == 50000
    assert len(CLEVRDataset(clevr_root, ["rgb"], "val")) == 5000
    assert len(CLEVRDataset(clevr_root, ["rgb"], "test")) == 5000


@pytest.fixture(scope="module")
def clevr_extra_root(tmp_path_factory):
    """Fixture for the loader-surface-only tasks (principal_curvature,
    reshading — reference src/datasets/clevr.py:60-79)."""
    root = tmp_path_factory.mktemp("clevr_extra")
    rng = np.random.default_rng(1)
    for task in ("principal_curvature", "reshading"):
        d = root / task / "val"
        d.mkdir(parents=True, exist_ok=True)
        arr = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
        Image.fromarray(arr).save(
            d / f"point_0_view_0_domain_{task}.png")
    return str(root), rng


def test_principal_curvature_first_two_channels(clevr_extra_root):
    root, _ = clevr_extra_root
    ds = CLEVRDataset(root, ["principal_curvature"], "val", 256)
    x = ds[0]["principal_curvature"]
    assert x.shape == (256, 256, 2) and x.dtype == np.float32
    raw = np.asarray(Image.open(os.path.join(
        root, "principal_curvature", "val",
        "point_0_view_0_domain_principal_curvature.png")))
    np.testing.assert_allclose(x, raw[..., :2].astype(np.float32) / 255.0)


def test_reshading_single_channel(clevr_extra_root):
    root, _ = clevr_extra_root
    ds = CLEVRDataset(root, ["reshading"], "val", 256)
    x = ds[0]["reshading"]
    assert x.shape == (256, 256, 1) and x.dtype == np.float32
    raw = np.asarray(Image.open(os.path.join(
        root, "reshading", "val", "point_0_view_0_domain_reshading.png")))
    np.testing.assert_allclose(x, raw[..., :1].astype(np.float32) / 255.0)
