"""Fused deconv(k5,s2) + IGDN Pallas kernel — decoder epilogue prototype.

The decode path is chains of [deconv k5s2 -> IGDN] (reference output heads
and the CompressAI g_s, SURVEY.md §2.4/X1/X6). Left to XLA, the deconv
output round-trips HBM before the IGDN chain (square -> channel matmul ->
sqrt -> mul) reads it back. This kernel keeps the deconv result in VMEM and
applies IGDN in-register.

Design: a stride-2 k5 transposed conv splits into 4 output-parity classes
(subpixel decomposition). With our deconv geometry (padding k//2 = 2,
output_padding 1 — ops/layers.py:deconv):

    out[2a,   2b  ] = sum_{i,j in {-1,0,1}} x[a+i, b+j] @ w[2-2i, 2-2j]
    out[2a+1, 2b  ] = sum_{i in {0,1}, j in {-1,0,1}} x[a+i, b+j] @ w[2i+1... ]

i.e. parity 0 uses taps {0,2,4} at input offsets {-1,0,+1}; parity 1 uses
taps {1,3} at offsets {0,+1}. Each tap is a (Cin, Cout) matmul on the MXU.
IGDN (y * sqrt(beta + y^2 @ gamma^T)) is applied per parity plane — GDN
mixes only channels, so parity planes are independent — and the final
depth-to-space interleave is left to XLA (pure layout).

Grid is (B,): one image per program; decoder feature maps (<= ~130x130xC
padded inputs) fit VMEM. Forward/inference only — training keeps the XLA
path. This is the measured-first experiment of DESIGN.md; see the
'Pallas deconv+IGDN epilogue' entry there for the verdict.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (input_offset_in_padded, tap) pairs per output parity; padded offset =
# true offset + 1 (the input is zero-padded by 1 on each spatial edge)
_TAPS = {0: ((0, 0), (1, 2), (2, 4)), 1: ((1, 1), (2, 3))}


def _kernel(x_ref, w_ref, b_ref, gamma_ref, beta_ref, out_ref, *, h, w,
            igdn):
    cin = x_ref.shape[-1]
    cout = out_ref.shape[-1]
    for dh in (0, 1):
        for dw in (0, 1):
            acc = jnp.zeros((h * w, cout), jnp.float32)
            for ih, th in _TAPS[dh]:
                for iw, tw in _TAPS[dw]:
                    tile = x_ref[0, ih:ih + h, iw:iw + w, :]
                    acc += jax.lax.dot(
                        tile.reshape(h * w, cin), w_ref[th, tw],
                        preferred_element_type=jnp.float32)
            y = acc + b_ref[0, :]
            if igdn is not None:
                norm = jax.lax.dot_general(
                    y * y, gamma_ref[:],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + beta_ref[0, :]
                y = y * (jnp.sqrt(norm) if igdn == "igdn"
                         else jax.lax.rsqrt(norm))
            out_ref[0, dh * 2 + dw] = y.reshape(h, w, cout).astype(
                out_ref.dtype)


def deconv_igdn_pallas(x, w, b, gamma=None, beta=None, mode="igdn",
                       interpret=False):
    """x (B,H,W,Cin), w (5,5,Cin,Cout), b (Cout,) [+ gamma (Cout,Cout),
    beta (Cout,)] -> (B,2H,2W,Cout). mode: 'igdn' | 'gdn' | None."""
    assert w.shape[0] == w.shape[1] == 5, "k5s2 only"
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    igdn = mode if gamma is not None else None
    if igdn is None:
        gamma = jnp.zeros((cout, cout), x.dtype)
        beta = jnp.zeros((cout,), x.dtype)
    planes = pl.pallas_call(
        functools.partial(_kernel, h=h, w=wd, igdn=igdn),
        out_shape=jax.ShapeDtypeStruct((bsz, 4, h, wd, cout), x.dtype),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, h + 2, wd + 2, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, 5, cin, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, h, wd, cout), lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, w, b.reshape(1, cout), gamma, beta.reshape(1, cout))
    # depth-to-space: planes[b, 2*dh+dw, a, c] -> out[b, 2a+dh, 2c+dw]
    planes = planes.reshape(bsz, 2, 2, h, wd, cout)
    out = planes.transpose(0, 3, 1, 4, 2, 5)  # b, a, dh, c, dw, cout
    return out.reshape(bsz, 2 * h, 2 * wd, cout)
