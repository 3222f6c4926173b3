"""Core codec layers: strided conv / transposed conv and (I)GDN.

TPU-native design notes
-----------------------
* Layout is **NHWC** throughout (TPU convs want the channel dim minor so XLA
  can tile it onto the 128-lane axis); the reference is NCHW torch.
* Geometry matches the reference's CompressAI helpers exactly
  (`compressai/models/utils.py` conv/deconv, cited via SURVEY.md X7):
  conv  = Conv2d(k, stride s, padding k//2)
  deconv= ConvTranspose2d(k, stride s, output_padding s-1, padding k//2)
  so for even input H: conv k5s2 halves and deconv k5s2 exactly doubles.
* Transposed conv is expressed as an input-dilated regular convolution
  (lhs_dilation=s, padding (k-1-p, k-1-p+op)) — a single
  `lax.conv_general_dilated`, which XLA maps straight onto the MXU.
* GDN: y = x / sqrt(beta + (x^2) @ gamma^T); IGDN multiplies instead.
  In NHWC the 1x1 conv of the reference (`compressai/layers/gdn.py`,
  SURVEY.md X6) is a plain channel matmul — pure MXU work that XLA fuses
  with the surrounding square/rsqrt elementwise ops.
"""

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from .bound import lower_bound

Dtype = Any

_DN = ("NHWC", "HWIO", "NHWC")


import os

# Conv accumulation precision policy. On TPU, f32 convs default to fast
# single-pass bf16 MXU execution; MMNC_CONV_PRECISION=highest opts into
# exact f32 (6-pass) when bit-level parity with CPU math matters. On CPU
# (tests) convs are exact f32 regardless. NOTE: "highest" multiplies the
# HLO ~6x per conv — large enough to overwhelm slow AOT compilers.
_PRECISION_ENV = os.environ.get("MMNC_CONV_PRECISION", "default").lower()
_PRECISION = (jax.lax.Precision.HIGHEST if _PRECISION_ENV == "highest"
              else None)


def _conv_precision(dtype):
    del dtype
    return _PRECISION


def _conv_s2d_k5s2(x, w):
    """k5/s2 conv on a small-C_in input as a k3/s1 conv over the 2x2
    space-to-depth transform of the input.

    Why: the MXU contracts over kh*kw*Cin; at Cin=3 (rgb head, 256px — the
    largest-spatial conv in the codec) that is 75 elements against the
    128-deep systolic array, and XLA's tiling of the narrow strided conv
    runs far below peak. The s2d form trades it for a 3x3 stride-1 conv
    with Cin 4x larger (contraction 108 at rgb) on a 2x-smaller grid.

    Math (pad k//2 = 2, torch geometry): out(x) = sum_{i<5} w[i] in(2x+i-2).
    Writing input rows as (2u+a), a in {0,1}: taps with i = 2*du+2+a land
    on u = x+du, du in {-1,0,1} — i.e. a 3-tap stride-1 window over the
    s2d grid (pad 1), with the a=1 parity contributing only 2 taps
    (i=5 falls outside the 5-tap kernel and is zero-padded). Same taps hit
    the same inputs as `conv`; only float summation order differs.
    Requires even H and W.
    """
    b, h, wd, c = x.shape
    # s2d input: (B, H/2, W/2, a, b, C) flattened channel-minor
    xs = x.reshape(b, h // 2, 2, wd // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, wd // 2, 4 * c)
    # packed kernel: w6[du+1, dv+1, a, b, c, f] = w[2*du+2+a, 2*dv+2+b, c, f]
    # (tap i = 2*du+2+a -> du+1 = (i-a)/2, so parity-a rows w[a::2] land at
    # kernel positions 0..len-1; the a=1 parity has only 2 taps, the third
    # stays zero)
    w6 = jnp.zeros((3, 3, 2, 2, c, w.shape[3]), w.dtype)
    for a in (0, 1):
        for bb in (0, 1):
            sub = w[a::2, bb::2]               # (3-a, 3-bb, c, f)
            w6 = w6.at[:sub.shape[0], :sub.shape[1], a, bb, :, :].set(sub)
    w3 = w6.reshape(3, 3, 4 * c, w.shape[3])
    return jax.lax.conv_general_dilated(
        xs, w3, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=_DN, precision=_conv_precision(x.dtype))


# First-conv lowering for k5/s2 with small Cin: "s2d" (space-to-depth,
# above) or "direct" (plain strided conv). Default set by measurement via
# bench.py's autotune; engages only when Cin <= _S2D_MAX_CIN and H,W even.
_CONV_S2D_IMPL = os.environ.get("MMNC_CONV_S2D", "direct").lower()
_S2D_MAX_CIN = 8


def conv(x, w, stride: int = 2):
    """Strided cross-correlation with torch padding k//2. w: (kh, kw, Cin, Cout)."""
    k = w.shape[0]
    if (stride == 2 and k == 5 and _CONV_S2D_IMPL == "s2d"
            and w.shape[2] <= _S2D_MAX_CIN
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
        return _conv_s2d_k5s2(x, w)
    p = k // 2
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(p, p), (p, p)], dimension_numbers=_DN,
        precision=_conv_precision(x.dtype),
    )


def _deconv_dilated(x, w, stride: int = 2):
    """Transposed conv as cross-correlation over the s-dilated input with
    padding (k-1-p) leading / (k-1-p+op) trailing."""
    k = w.shape[0]
    p = k // 2
    op = stride - 1
    lo = k - 1 - p
    hi = k - 1 - p + op
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1),
        padding=[(lo, hi), (lo, hi)],
        lhs_dilation=(stride, stride), dimension_numbers=_DN,
        precision=_conv_precision(x.dtype),
    )


def _deconv_phase_k5s2(x, w):
    """k5/s2 transposed conv as 4 DENSE phase convs + sub-pixel interleave.

    Same math as `_deconv_dilated` (same taps hit the same inputs; only the
    float summation order can differ), but the MXU never sees the dilated
    zeros: output phase (rh, rw) with rh,rw in {0,1} is
        out[2m+rh, 2n+rw] = conv(x, w[taps(rh), taps(rw)])
    where taps(0) = w[0::2] over a (m-1..m+1) window (pad 1,1) and
    taps(1) = w[1::2] over (m..m+1) (pad 0,1) — derived by splitting
    out[o] = sum_t w[t]*dilated[o-2+t] by the parity of o. Valid for any
    input H,W >= 1 (incl. the saturated 1x1 latents: 1 -> 2).
    """
    prec = _conv_precision(x.dtype)

    def phase(rh, rw):
        kern = w[rh::2, rw::2]
        pad_h = (0, 1) if rh else (1, 1)
        pad_w = (0, 1) if rw else (1, 1)
        return jax.lax.conv_general_dilated(
            x, kern, window_strides=(1, 1), padding=[pad_h, pad_w],
            dimension_numbers=_DN, precision=prec)

    p00, p01, p10, p11 = (phase(0, 0), phase(0, 1), phase(1, 0), phase(1, 1))
    b, h, wd, c = p00.shape
    row0 = jnp.stack([p00, p01], axis=3)          # (B,H,W,2,C)
    row1 = jnp.stack([p10, p11], axis=3)
    y = jnp.stack([row0, row1], axis=2)           # (B,H,2,W,2,C)
    return y.reshape(b, 2 * h, 2 * wd, c)


def _deconv_phase_packed_k5s2(x, w):
    """k5/s2 transposed conv as ONE dense k3 conv with 4*Cout channels,
    followed by a sub-pixel interleave (depth-to-space).

    Same taps as `_deconv_phase_k5s2`, but all four phases ride a single
    MXU contraction: the 2-tap odd-parity kernels are zero-padded to
    3 taps at the *leading* position so every phase shares the
    (pad 1,1) x (pad 1,1) window — with a 3-tap window over (m-1..m+1),
    placing a 2-tap kernel at positions (1,2) reproduces the odd phase's
    (m..m+1) window exactly. One conv call instead of four quadruples the
    output-channel (lane) occupancy — decisive for the decoder's narrow
    stages (Cout=3 rgb: 12 packed lanes beats 4x3) — at the cost of the
    36/25 zero-tap MACs, which are free when the stage is bandwidth-bound.
    """
    cin, cout = w.shape[2], w.shape[3]
    # packed kernel: (3, 3, cin, 4, cout); phase p = 2*rh + rw on axis 3
    kk = jnp.zeros((3, 3, cin, 4, cout), w.dtype)
    for rh in (0, 1):
        for rw in (0, 1):
            sub = w[rh::2, rw::2]                     # (3-rh, 3-rw, cin, cout)
            kk = kk.at[3 - sub.shape[0]:, 3 - sub.shape[1]:,
                       :, 2 * rh + rw, :].set(sub)
    y = jax.lax.conv_general_dilated(
        x, kk.reshape(3, 3, cin, 4 * cout), window_strides=(1, 1),
        padding=[(1, 1), (1, 1)], dimension_numbers=_DN,
        precision=_conv_precision(x.dtype))
    b, h, wd, _ = y.shape
    y = y.reshape(b, h, wd, 2, 2, cout)               # (..., rh, rw, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * wd, cout)


# Deconv lowering: "phase" feeds the MXU 4 dense phase convs (the dilated
# form makes the MXU contract over the interleaved zeros); "packed" fuses
# the 4 phases into one conv with 4*Cout channels + depth-to-space;
# "dilated" is the single conv_general_dilated call. k != 5 or stride != 2
# always takes the dilated path. Default set by measurement
# (scripts/measure_deconv_igdn.py, artifacts/deconv_impl_ab.json).
_DECONV_IMPL = os.environ.get("MMNC_DECONV_IMPL", "dilated").lower()


def deconv(x, w, stride: int = 2):
    """Transposed conv, torch geometry (padding k//2, output_padding stride-1).

    For even inputs this exactly doubles H and W when stride=2 (incl.
    H=1 -> 2). k5/s2 (the only shape the codecs use) takes the dense
    phase-decomposed path unless MMNC_DECONV_IMPL=dilated.
    """
    if stride == 2 and w.shape[0] == 5:
        if _DECONV_IMPL == "phase":
            return _deconv_phase_k5s2(x, w)
        if _DECONV_IMPL == "packed":
            return _deconv_phase_packed_k5s2(x, w)
    return _deconv_dilated(x, w, stride)


# torch Conv2d default init scale (kaiming-uniform, a=sqrt(5) -> variance
# 1/(3*fan_in)). The deep IGDN decoder chains amplify activations
# superlinearly, so the reference-matching (smaller) init scale matters for
# stability of the untrained net.
_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class Conv(nn.Module):
    """conv(k,s) module matching the reference's `conv` helper (SURVEY.md X7)."""
    features: int
    kernel_size: int = 5
    stride: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.kernel_size
        w = self.param(
            "kernel", _kernel_init, (k, k, cin, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        y = conv(x.astype(self.dtype), w.astype(self.dtype), self.stride)
        return y + b.astype(self.dtype)


class Deconv(nn.Module):
    """deconv(k,s) module matching the reference's `deconv` helper (SURVEY.md X7)."""
    features: int
    kernel_size: int = 5
    stride: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.kernel_size
        w = self.param(
            "kernel", _kernel_init, (k, k, cin, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        y = deconv(x.astype(self.dtype), w.astype(self.dtype), self.stride)
        return y + b.astype(self.dtype)


# --- GDN -------------------------------------------------------------------

# NonNegativeParametrizer constants (compressai/layers/gdn.py semantics,
# SURVEY.md X6): params are stored as sqrt(value + pedestal) and recovered by
# lower-bounded squaring, keeping beta/gamma non-negative under SGD.
_REPARAM_OFFSET = 2.0 ** -18
_PEDESTAL = _REPARAM_OFFSET ** 2
_BETA_MIN = 1e-6


def nonneg_init(value):
    return jnp.sqrt(jnp.maximum(value + _PEDESTAL, _PEDESTAL))


def nonneg_forward(reparam, minimum: float = 0.0):
    bound = float((minimum + _REPARAM_OFFSET ** 2) ** 0.5)
    out = lower_bound(reparam, bound)
    return out * out - _PEDESTAL


# GDN implementation: "xla" (einsum chain, XLA-fused) or "pallas" (fused
# single-VMEM-pass kernel, ops/gdn_pallas.py). Pallas only engages on TPU.
_GDN_IMPL = os.environ.get("MMNC_GDN_IMPL", "xla").lower()


class GDN(nn.Module):
    """Generalized Divisive Normalization (Balle et al.).

    y_i = x_i / sqrt(beta_i + sum_j gamma_ij x_j^2)   (inverse=True multiplies)

    gamma layout is (out, in) like the reference's 1x1 conv weight; in NHWC
    the normalizer is `x^2 @ gamma.T + beta` — one channel-channel matmul.
    """
    inverse: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        beta_r = self.param(
            "beta", lambda _: nonneg_init(jnp.ones((c,), jnp.float32)))
        gamma_r = self.param(
            "gamma", lambda _: nonneg_init(0.1 * jnp.eye(c, dtype=jnp.float32)))
        beta = nonneg_forward(beta_r, _BETA_MIN)
        gamma = nonneg_forward(gamma_r)

        x = x.astype(self.dtype)
        if _GDN_IMPL == "pallas" and jax.default_backend() not in ("cpu",):
            from .gdn_pallas import gdn_pallas
            return gdn_pallas(x, gamma.astype(self.dtype),
                              beta.astype(self.dtype), inverse=self.inverse)

        x2 = x * x
        norm = jnp.einsum(
            "bhwc,oc->bhwo", x2, gamma.astype(self.dtype),
            preferred_element_type=jnp.float32,
            precision=_conv_precision(self.dtype),
        ) + beta
        if self.inverse:
            return x * jnp.sqrt(norm).astype(self.dtype)
        return x * jax.lax.rsqrt(norm).astype(self.dtype)
