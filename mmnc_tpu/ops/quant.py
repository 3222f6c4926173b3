"""Quantization ops for entropy-model training and eval.

Train-time: additive U(-1/2, 1/2) noise (differentiable surrogate).
Eval/compress: round around per-channel medians (STE available for
finetuning). Matches compressai's EntropyModel.quantize modes
("noise" / "dequantize" / "symbols"); see SURVEY.md X2.
"""

import jax
import jax.numpy as jnp


def quantize_noise(x, rng):
    return x + jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)


def quantize_round(x, medians=None):
    """Hard round (optionally around medians). Not differentiable."""
    if medians is None:
        return jnp.round(x)
    return jnp.round(x - medians) + medians


@jax.custom_vjp
def _ste_round(x):
    return jnp.round(x)


def _ste_round_fwd(x):
    return jnp.round(x), None


def _ste_round_bwd(_, g):
    return (g,)


_ste_round.defvjp(_ste_round_fwd, _ste_round_bwd)


def quantize_ste(x, medians=None):
    """Straight-through round: forward = round, backward = identity."""
    if medians is None:
        return _ste_round(x)
    return _ste_round(x - medians) + medians
