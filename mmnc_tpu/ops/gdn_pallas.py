"""Fused Pallas GDN/IGDN kernel for TPU.

The (I)GDN normalizer is square -> channel matmul -> (r)sqrt -> multiply.
Left to XLA this is a chain with intermediate tensors (x^2, norm) that can
round-trip HBM at feature-map sizes (a 256x256x100 f32 map is 26 MB); the
Pallas kernel performs the whole chain in one VMEM pass per tile:

    load x tile (TILE_N, C) -> x2 = x*x (VPU) -> x2 @ gamma^T (MXU)
    -> + beta -> rsqrt/sqrt (VPU) -> * x -> store

Grid: 1-D over row tiles of the (B*H*W, C) flattening; gamma/beta are
broadcast to every program. The backward pass is plain JAX (two matmuls XLA
handles well) wired through jax.custom_vjp:

    n_i = beta_i + sum_j gamma_ij x_j^2 ;  r = n^(-1/2)
    GDN:  y = x*r ;   u = g*x*r^3
          dx = g*r - x*(u @ gamma) ; dgamma = -1/2 u^T @ x^2 ; dbeta = -1/2 sum u
    IGDN: y = x*s, s = n^(1/2) ; u = g*x/s
          dx = g*s + x*(u @ gamma) ; dgamma = 1/2 u^T @ x^2 ; dbeta = 1/2 sum u

Equivalent capability to the reference's GDN layer (compressai
layers/gdn.py, SURVEY.md X6) — this file is the perf path; ops/layers.GDN
is the reference implementation both are tested against.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gdn_kernel(x_ref, gamma_ref, beta_ref, out_ref, *, inverse):
    x = x_ref[:]
    x2 = x * x
    norm = jax.lax.dot_general(
        x2, gamma_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),  # x2 @ gamma^T
        preferred_element_type=jnp.float32,
    ) + beta_ref[0, :]
    if inverse:
        out_ref[:] = (x * jnp.sqrt(norm)).astype(out_ref.dtype)
    else:
        out_ref[:] = (x * jax.lax.rsqrt(norm)).astype(out_ref.dtype)


def _round_up(v, m):
    return (v + m - 1) // m * m


def _gdn_forward(x2d, gamma, beta, inverse, interpret=False):
    n, c = x2d.shape
    tile_n = min(_round_up(n, 8), 1024)
    n_pad = _round_up(n, tile_n)
    if n_pad != n:
        x2d = jnp.pad(x2d, ((0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_gdn_kernel, inverse=inverse),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), x2d.dtype),
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2d, gamma, beta.reshape(1, c))
    return out[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gdn_pallas_2d(x2d, gamma, beta, inverse=False, interpret=False):
    """(N, C) x (C, C) x (C,) -> (N, C); gamma layout (out, in)."""
    return _gdn_forward(x2d, gamma, beta, inverse, interpret)


def _fwd(x2d, gamma, beta, inverse, interpret):
    return _gdn_forward(x2d, gamma, beta, inverse, interpret), (x2d, gamma, beta)


def _bwd(inverse, interpret, res, g):
    x, gamma, beta = res
    x2 = x * x
    norm = x2 @ gamma.T + beta[None, :]
    if inverse:
        s = jnp.sqrt(norm)
        u = g * x / s
        dx = g * s + x * (u @ gamma)
        dgamma = 0.5 * (u.T @ x2)
        dbeta = 0.5 * jnp.sum(u, axis=0)
    else:
        r = jax.lax.rsqrt(norm)
        u = g * x * (r * r * r)
        dx = g * r - x * (u @ gamma)
        dgamma = -0.5 * (u.T @ x2)
        dbeta = -0.5 * jnp.sum(u, axis=0)
    return dx, dgamma, dbeta


gdn_pallas_2d.defvjp(_fwd, _bwd)


def gdn_pallas(x, gamma, beta, inverse=False, interpret=False):
    """NHWC wrapper: x (B,H,W,C), gamma (C,C) [out,in], beta (C,)."""
    b, h, w, c = x.shape
    y = gdn_pallas_2d(x.reshape(-1, c), gamma, beta, inverse, interpret)
    return y.reshape(b, h, w, c)
