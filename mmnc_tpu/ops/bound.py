"""Bound ops with pass-through-inward gradients.

Equivalent capability to compressai.ops.bound_ops.LowerBound (the reference
uses it inside GaussianConditional's scale bound and GDN's
NonNegativeParametrizer; see SURVEY.md X8). Implemented as `jax.custom_vjp`:
the gradient passes through when the value is above the bound OR when the
upstream gradient pushes the value back toward the feasible set.

`bound` is a static Python float (it always is in this framework: GDN
reparam pedestals and the 0.11 scale bound are compile-time constants).
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def lower_bound(x, bound):
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), x


def _lower_bound_bwd(bound, x, g):
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0),)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def upper_bound(x, bound):
    return jnp.minimum(x, bound)


def _upper_bound_fwd(x, bound):
    return jnp.minimum(x, bound), x


def _upper_bound_bwd(bound, x, g):
    pass_through = (x <= bound) | (g > 0)
    return (jnp.where(pass_through, g, 0.0),)


upper_bound.defvjp(_upper_bound_fwd, _upper_bound_bwd)
