"""Fully-factorized learned entropy model ("EntropyBottleneck").

From-scratch JAX implementation of the capability of
compressai.entropy_models.EntropyBottleneck (SURVEY.md X2; used by the
reference at src/models/multi_task_compressor.py:387,488,543):

* a learned univariate density per channel, parameterized by a K-layer
  monotone MLP chain (softplus(matrix) @ x + bias, then x + tanh(factor) *
  tanh(x)), filters (3,3,3,3);
* likelihood of an integer-quantized value v: sigmoid(logits(v + 1/2)) -
  sigmoid(logits(v - 1/2)), evaluated with a sign trick for stability and
  lower-bounded at 1e-9;
* learnable `quantiles` (per channel: left tail, median, right tail) trained
  by a separate auxiliary loss |logits(quantiles) - target| (the reference's
  aux optimizer trains exactly these, multi_task_compressor.py:394-397);
* train-time quantization = additive U(-1/2,1/2) noise; eval = round around
  the per-channel median.

TPU notes: everything here is elementwise + tiny per-channel matmuls that
XLA fuses into the surrounding graph; data enters as NHWC and is evaluated
channel-major as (C, 1, B*H*W) so the chain's per-channel weights broadcast.
"""

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.bound import lower_bound
from ..ops.quant import quantize_noise, quantize_round

LIKELIHOOD_BOUND = 1e-9
TAIL_MASS = 1e-9
INIT_SCALE = 10.0
FILTERS = (3, 3, 3, 3)


def _logits_cumulative(params, x, stop_density_grad: bool):
    """Evaluate the cumulative's logits at x: (C, 1, N) -> (C, 1, N).

    params: dict with matrix_{k} (C, f_out, f_in), bias_{k} (C, f_out, 1),
    factor_{k} (C, f_out, 1). With stop_density_grad the density weights are
    detached (the aux loss must only train the quantiles).
    """
    k_max = len(FILTERS) + 1
    logits = x
    for k in range(k_max):
        m = params[f"matrix_{k}"]
        b = params[f"bias_{k}"]
        if stop_density_grad:
            m = jax.lax.stop_gradient(m)
            b = jax.lax.stop_gradient(b)
        m = jax.nn.softplus(m)
        logits = jnp.einsum("coi,cin->con", m, logits,
                            preferred_element_type=jnp.float32) + b
        if k < k_max - 1:
            f = params[f"factor_{k}"]
            if stop_density_grad:
                f = jax.lax.stop_gradient(f)
            logits = logits + jnp.tanh(f) * jnp.tanh(logits)
    return logits


def _sign_sigmoid_likelihood(lower, upper):
    """|sigmoid(s*upper) - sigmoid(s*lower)| with s = -sign(lower+upper)."""
    sign = -jnp.sign(lower + upper)
    sign = jax.lax.stop_gradient(sign)
    return jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))


class EntropyBottleneck(nn.Module):
    """Factorized-prior bottleneck over the channel-minor axis of NHWC input."""
    channels: int

    def setup(self):
        import math
        filters = (1,) + FILTERS + (1,)
        scale = INIT_SCALE ** (1.0 / (len(FILTERS) + 1))
        params = {}
        for k in range(len(FILTERS) + 1):
            f_in, f_out = filters[k], filters[k + 1]
            init = math.log(math.expm1(1.0 / scale / f_out))
            params[f"matrix_{k}"] = self.param(
                f"matrix_{k}",
                lambda rng, v=init, s=(self.channels, f_out, f_in):
                    jnp.full(s, v, jnp.float32))
            params[f"bias_{k}"] = self.param(
                f"bias_{k}",
                lambda rng, s=(self.channels, f_out, 1):
                    jax.random.uniform(rng, s, jnp.float32, -0.5, 0.5))
            if k < len(FILTERS):
                params[f"factor_{k}"] = self.param(
                    f"factor_{k}",
                    lambda rng, s=(self.channels, f_out, 1):
                        jnp.zeros(s, jnp.float32))
        self._density = params

        def q_init(rng):
            q = jnp.array([-INIT_SCALE, 0.0, INIT_SCALE], jnp.float32)
            return jnp.tile(q[None, None, :], (self.channels, 1, 1))
        self.quantiles = self.param("quantiles", q_init)

    def medians(self):
        return self.quantiles[:, 0, 1]

    def __call__(self, x, rng=None, training: bool = True):
        """x: (B, H, W, C). Returns (x_hat, likelihoods) both (B, H, W, C)."""
        params = self._density
        medians = self.quantiles[:, 0, 1]

        if training:
            if rng is None:
                rng = self.make_rng("noise")
            x_hat = quantize_noise(x, rng)
        else:
            x_hat = quantize_round(x, medians[None, None, None, :])

        b, h, w, c = x.shape
        # density math always in f32 (bf16 activations upcast here so the
        # likelihood/rate estimates stay accurate in mixed precision)
        v = jnp.transpose(x_hat.astype(jnp.float32), (3, 0, 1, 2)
                          ).reshape(c, 1, -1)
        lower = _logits_cumulative(params, v - 0.5, stop_density_grad=False)
        upper = _logits_cumulative(params, v + 0.5, stop_density_grad=False)
        likelihood = _sign_sigmoid_likelihood(lower, upper)
        likelihood = lower_bound(likelihood, LIKELIHOOD_BOUND)
        likelihood = jnp.transpose(likelihood.reshape(c, b, h, w), (1, 2, 3, 0))
        return x_hat, likelihood

    def aux_loss(self):
        """|logits(quantiles) - target| summed; trains quantiles only."""
        import math
        logits = _logits_cumulative(self._density, self.quantiles,
                                    stop_density_grad=True)
        target = math.log(2.0 / TAIL_MASS - 1.0)
        targets = jnp.array([-target, 0.0, target], jnp.float32)[None, None, :]
        return jnp.sum(jnp.abs(logits - targets))


def eb_pmf(params_dict, quantiles, max_length: int, minima):
    """Sample the per-channel pmf over the quantile-spanned integer range.

    Pure function of extracted param arrays (host or device). Returns
    (pmf (C, max_length), tail_mass (C,)). minima: (C,) int array; samples
    for channel c start at median_c - minima_c.
    """
    medians = quantiles[:, 0, 1]
    pmf_start = medians - minima.astype(jnp.float32)
    samples = jnp.arange(max_length, dtype=jnp.float32)[None, None, :] \
        + pmf_start[:, None, None]
    lower = _logits_cumulative(params_dict, samples - 0.5, True)
    upper = _logits_cumulative(params_dict, samples + 0.5, True)
    pmf = _sign_sigmoid_likelihood(lower, upper)[:, 0, :]
    tail_mass = (jax.nn.sigmoid(lower[:, 0, 0])
                 + jax.nn.sigmoid(-upper[:, 0, -1]))
    return pmf, tail_mass
