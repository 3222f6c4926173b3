"""Model-zoo tests: all four variants' geometry, losses, and the real
compress/decompress round trip (reference behaviors per SURVEY.md §2.3-2.4).

All inputs are 256px — the reference architecture's closed geometry (the
decoder stack always emits 256px once the latent saturates; the reference
resizes every dataset to 256, src/train.py:172-174).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmnc_tpu.models import build_model


def _batch_for(model, bs=1, seed=0):
    # example_batch already emits valid per-task ranges (semantic = integer
    # class indices 0..16)
    return model.example_batch(batch_size=bs, image_size=256, seed=seed)


@pytest.mark.parametrize("model_num,tasks", [
    (1, ["mono"]),
    (2, ["rgb", "depth_euclidean"]),
    (3, ["rgb", "normal"]),
    (4, ["rgb", "depth_euclidean", "semantic"]),
])
def test_variant_forward_and_loss(model_num, tasks):
    m = build_model(model_num, tasks, latent_channels=12, conv_channels=4)
    batch = _batch_for(m)
    v = m.init(jax.random.PRNGKey(0), batch)

    x_hats, lik = m.forward(v, batch, rng=jax.random.PRNGKey(1), training=True)
    for t, oc in zip(m.tasks, m.output_channels):
        assert x_hats[t].shape == (1, 256, 256, oc)
    assert lik["y"].shape[-1] == m.latent_channels
    assert jnp.all(lik["y"] > 0) and jnp.all(lik["z"] > 0)

    loss, (logs, _, _) = m.loss_and_logs(v, batch, jax.random.PRNGKey(2))
    assert jnp.isfinite(loss)
    for t in m.tasks:
        assert f"{t}/compression_loss" in logs
    aux = m.aux_loss(v)
    assert jnp.isfinite(aux) and float(aux) > 0


def test_single_task_asserts_one_task():
    with pytest.raises(AssertionError):
        build_model(1, ["rgb", "mono"], latent_channels=8, conv_channels=4)


def test_latent_autoround_disjoint_and_shared():
    m3 = build_model(3, ["rgb", "normal", "mono"], latent_channels=100,
                     conv_channels=6)
    assert m3.latent_channels == 99 and m3.channels_per_task == 33
    m4 = build_model(4, ["rgb", "normal", "mono"], latent_channels=100,
                     conv_channels=8)
    assert m4.latent_channels == 100 and m4.channels_per_task == 25


def test_single_task_has_no_log_vars():
    m = build_model(1, ["mono"], latent_channels=8, conv_channels=4)
    v = m.init(jax.random.PRNGKey(0), m.example_batch(image_size=256))
    assert "log_vars" not in v["params"]
    m2 = build_model(2, ["rgb", "mono"], latent_channels=8, conv_channels=4)
    v2 = m2.init(jax.random.PRNGKey(0), m2.example_batch(image_size=256))
    assert v2["params"]["log_vars"].shape == (2,)


def test_compress_decompress_matches_eval_forward():
    """Real rANS coding round trip == deterministic eval forward — the
    framework-level check_bpp guarantee. Covers both stream layouts:
    packed (default: one stream per batch) and per-image (reference's)."""
    m = build_model(2, ["rgb"], latent_channels=8, conv_channels=4)
    batch = _batch_for(m, bs=2)
    v = m.init(jax.random.PRNGKey(0), batch)
    tables = m.update_bottleneck_values(v)
    ref_hats, _ = m.forward(v, batch, training=False)

    ans, n_bytes = m.compress(v, tables, batch)
    assert n_bytes > 0
    assert len(ans["strings"][0]) == 1 and ans["batch_size"] == 2
    x_hats = m.decompress(v, tables, ans["strings"], ans["shape"],
                          ans["y_shape"], batch_size=ans["batch_size"])
    for t in m.tasks:
        np.testing.assert_allclose(np.asarray(x_hats[t]),
                                   np.asarray(ref_hats[t]), atol=1e-5)

    ans_pi, n_bytes_pi = m.compress(v, tables, batch, packed=False)
    assert len(ans_pi["strings"][0]) == 2 and len(ans_pi["strings"][1]) == 2
    # per-image strings flush the 8-byte rANS state once per image per
    # stream; the packed layout pays it once per batch
    assert n_bytes <= n_bytes_pi
    x_hats_pi = m.decompress(v, tables, ans_pi["strings"], ans_pi["shape"],
                             ans_pi["y_shape"])
    for t in m.tasks:
        np.testing.assert_allclose(np.asarray(x_hats_pi[t]),
                                   np.asarray(ref_hats[t]), atol=1e-5)


def test_legacy_broadcast_rate_vs_corrected():
    """legacy_broadcast=True counts each saturated-latent value 16x in the
    y-likelihood (B,4,4,M); corrected geometry crops to (B,1,1,M)."""
    mk = lambda legacy: build_model(
        2, ["mono"], latent_channels=8, conv_channels=4,
        legacy_broadcast=legacy, lmbda=1e-2)
    m_leg, m_cor = mk(True), mk(False)
    batch = _batch_for(m_leg)
    v = m_leg.init(jax.random.PRNGKey(0), batch)

    _, lik_leg = m_leg.forward(v, batch, training=False)
    _, lik_cor = m_cor.forward(v, batch, training=False)
    assert lik_leg["y"].shape == (1, 4, 4, 8)
    assert lik_cor["y"].shape == (1, 1, 1, 8)


def test_hyperparameters_self_description():
    m = build_model(4, ["rgb", "mono"], latent_channels=9, conv_channels=4)
    hp = m.hyper_parameters
    assert hp["model_class"] == "MultiTaskSharedLatentCompressor"
    assert hp["latent_channels"] == m.latent_channels
    from mmnc_tpu.models import MODEL_NAME
    m2 = MODEL_NAME[hp["model_class"]](
        tasks=hp["tasks"], input_channels=hp["input_channels"],
        output_channels=hp["output_channels"],
        latent_channels=hp["latent_channels"],
        conv_channels=hp["conv_channels"], lmbda=hp["lmbda"])
    assert m2.latent_channels == m.latent_channels
