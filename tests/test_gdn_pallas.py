"""Pallas GDN kernel vs the reference einsum implementation (interpret mode
on CPU; the compiled path runs on real TPU via bench/training)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmnc_tpu.ops.gdn_pallas import gdn_pallas


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 20)).astype(np.float32))
    gamma = jnp.asarray(
        (0.1 * np.eye(20) + 0.01 * rng.random((20, 20))).astype(np.float32))
    beta = jnp.asarray((1 + 0.1 * rng.random(20)).astype(np.float32))
    return x, gamma, beta


def _ref(x, gamma, beta, inverse):
    norm = jnp.einsum("bhwc,oc->bhwo", x * x, gamma) + beta
    return x * (jnp.sqrt(norm) if inverse else jax.lax.rsqrt(norm))


@pytest.mark.parametrize("inverse", [False, True])
def test_forward_matches(data, inverse):
    x, gamma, beta = data
    y = gdn_pallas(x, gamma, beta, inverse=inverse, interpret=True)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(_ref(x, gamma, beta, inverse)),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("inverse", [False, True])
def test_gradients_match_autodiff(data, inverse):
    x, gamma, beta = data

    def f_p(x, gamma, beta):
        return jnp.sum(jnp.sin(
            gdn_pallas(x, gamma, beta, inverse=inverse, interpret=True)))

    def f_r(x, gamma, beta):
        return jnp.sum(jnp.sin(_ref(x, gamma, beta, inverse)))

    gp = jax.grad(f_p, argnums=(0, 1, 2))(x, gamma, beta)
    gr = jax.grad(f_r, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_ragged_row_count(data):
    """N not divisible by the tile size exercises the padding path."""
    _, gamma, beta = data
    rng = np.random.default_rng(1)
    x_odd = jnp.asarray(rng.normal(size=(1, 3, 111, 20)).astype(np.float32))
    y = gdn_pallas(x_odd, gamma, beta, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(_ref(x_odd, gamma, beta, False)),
        rtol=1e-6, atol=1e-6)
