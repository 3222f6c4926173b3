"""Analysis toolkit tests (plots.ipynb / check_bpp.ipynb capabilities)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmnc_tpu import analysis
from mmnc_tpu.models import build_model


@pytest.fixture(scope="module")
def model_setup():
    m = build_model(3, ["rgb", "mono"], latent_channels=8, conv_channels=4,
                    lmbda=1e-2)
    batch = m.example_batch(batch_size=2, image_size=256)
    v = m.init(jax.random.PRNGKey(0), batch)
    return m, v, batch


def test_rd_point_extraction(tmp_path):
    path = tmp_path / "m.jsonl"
    rows = [
        {"step": 1, "train/loss": 5.0},
        {"step": 2, "val/compression_loss": 0.5, "val/rgb/psnr": 30.0,
         "val/rgb/ms-ssim": 0.9},
        {"step": 4, "val/compression_loss": 0.4, "val/rgb/psnr": 31.0,
         "val/rgb/ms-ssim": 0.95},
    ]
    path.write_text("\n".join(json.dumps(r) for r in rows))
    pt = analysis.final_rd_point(str(path), ["rgb"])
    assert pt["bpp"] == 0.4 and pt["rgb/psnr"] == 31.0


def test_plot_rd_curves(tmp_path):
    pts = {"mixed": [{"bpp": 0.1, "rgb/psnr": 30}, {"bpp": 0.3, "rgb/psnr": 34}],
           "disjoint": [{"bpp": 0.15, "rgb/psnr": 29}]}
    out = tmp_path / "rd.png"
    analysis.plot_rd_curves(pts, "rgb", out_path=str(out))
    assert out.exists() and out.stat().st_size > 0


@pytest.mark.parametrize("codec", ["JPEG", "WEBP"])
def test_classical_codec_bisection(codec):
    rng = np.random.default_rng(0)
    img = rng.random((128, 128, 3)).astype(np.float32)
    decoded, bpp, q = analysis.classical_codec_rd(img, target_bpp=1.0,
                                                  codec=codec, tol=0.2)
    assert decoded.shape == (128, 128, 3)
    assert 1 <= q <= 100 and bpp > 0


def test_channel_bpp_attribution(model_setup):
    m, v, batch = model_setup
    out = analysis.channel_bpp(m, v, batch)
    assert out["y"].shape == (m.latent_channels,)
    assert np.all(out["y"] >= 0)
    names = [s[0] for s in out["task_slices"]]
    assert names == ["rgb", "mono"]


def test_latent_slice_separability(model_setup):
    """Disjoint separability: perturbing task-0's y slice must change only
    task-0's reconstruction (the property the disjoint design exists for).
    Probed directly at the latent level — an untrained encoder quantizes
    every latent to zero (GDN chains normalize away input scale), so the
    encoder path can't produce distinguishable latents."""
    m, v, batch = model_setup
    y, z = m.encode_eval(v, batch)
    lo, hi = 0, m.channels_per_task
    y_pert = y.at[..., lo:hi].add(5.0)

    base = m.decode_from_latents(v, y, z)
    pert = m.decode_from_latents(v, y_pert, z)
    d_owned = float(jnp.abs(pert["rgb"] - base["rgb"]).max())
    d_other = float(jnp.abs(pert["mono"] - base["mono"]).max())
    assert d_other == 0.0, "mono head must not see rgb's slice"
    assert d_owned > 0.0


def test_swap_latent_slices_api(model_setup):
    m, v, batch = model_setup
    batch_b = m.example_batch(batch_size=2, image_size=256, seed=7)
    out = analysis.swap_latent_slices(m, v, batch, batch_b,
                                      channels=range(0, m.channels_per_task))
    assert set(out.keys()) == {"rgb", "mono"}


def test_average_channels_runs(model_setup):
    m, v, batch = model_setup
    out = analysis.average_channels(m, v, batch, channels=[0, 1])
    assert set(out.keys()) == {"rgb", "mono"}


def test_check_bpp(model_setup):
    m, v, batch = model_setup
    tables = m.update_bottleneck_values(v)
    res = analysis.check_bpp(m, v, tables, batch)
    assert res["bytes"] > 0
    assert res["actual_bpp"] > 0 and res["estimated_bpp"] > 0
    # at 256px the head+g_a saturate y to 1x1 while scales broadcast 4x4,
    # so the legacy (training-geometry) estimate counts each y value 16x:
    # it must exceed the corrected-geometry estimate, which is the
    # like-for-like comparator for the real bitstream
    assert res["estimated_bpp_legacy"] > res["estimated_bpp"]
