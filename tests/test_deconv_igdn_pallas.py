"""Fused deconv+IGDN Pallas kernel vs the XLA reference chain
(ops/layers.deconv + the GDN math), in interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmnc_tpu.ops.layers import deconv
from mmnc_tpu.ops.deconv_igdn_pallas import deconv_igdn_pallas


def _ref_chain(x, w, b, gamma, beta, mode):
    y = deconv(x, w, stride=2) + b
    if mode is None:
        return y
    norm = (jnp.einsum("bhwc,oc->bhwo", y * y, gamma) + beta)
    return y * (jnp.sqrt(norm) if mode == "igdn" else jax.lax.rsqrt(norm))


@pytest.mark.parametrize("mode", ["igdn", "gdn", None])
@pytest.mark.parametrize("shape", [(2, 4, 4, 8), (1, 7, 5, 8)])
def test_matches_xla_chain(mode, shape):
    rng = np.random.default_rng(0)
    b_, h, w_, cin = shape
    cout = 8
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    w = jnp.asarray(rng.normal(size=(5, 5, cin, cout)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    gamma = jnp.asarray(rng.random((cout, cout)) * 0.1, jnp.float32)
    beta = jnp.asarray(1.0 + rng.random((cout,)), jnp.float32)

    got = deconv_igdn_pallas(x, w, b,
                             gamma if mode else None,
                             beta if mode else None,
                             mode=mode or "igdn", interpret=True)
    want = _ref_chain(x, w, b, gamma, beta, mode)
    assert got.shape == (b_, 2 * h, 2 * w_, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_matches_trained_layer_geometry():
    """Same geometry as the decoder's Deconv modules: even input doubles."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(5, 5, 4, 6)) * 0.3, jnp.float32)
    b = jnp.zeros((6,), jnp.float32)
    got = deconv_igdn_pallas(x, w, b, mode=None, interpret=True)
    want = deconv(x, w, stride=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
