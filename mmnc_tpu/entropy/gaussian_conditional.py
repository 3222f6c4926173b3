"""Conditional Gaussian entropy model over predicted scales.

From-scratch JAX implementation of the capability of
compressai.entropy_models.GaussianConditional (SURVEY.md X3; the reference
drives it via ScaleHyperprior's forward and at
src/models/multi_task_compressor.py:487,545-546):

* zero-mean Gaussian likelihood of an integer-quantized value v under scale
  sigma: Phi((1/2 - |v|)/sigma) - Phi((-1/2 - |v|)/sigma), with Phi evaluated
  as 0.5*erfc(-x/sqrt(2));
* sigma lower-bounded at SCALE_BOUND = 0.11 (pass-through-inward gradient);
* a 64-entry log-spaced scale table in [0.11, 256] for real coding;
  `build_indexes` maps each predicted sigma to its table bucket.
"""

import jax
import jax.numpy as jnp

from ..ops.bound import lower_bound
from ..ops.quant import quantize_noise, quantize_round

SCALE_BOUND = 0.11
SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64
LIKELIHOOD_BOUND = 1e-9
TAIL_MASS = 1e-9


def get_scale_table(minimum=SCALES_MIN, maximum=SCALES_MAX, levels=SCALES_LEVELS):
    """64 log-spaced scales; same recipe as compressai.models.base.get_scale_table
    (imported by the reference at multi_task_compressor.py:20)."""
    return jnp.exp(jnp.linspace(
        jnp.log(jnp.float32(minimum)), jnp.log(jnp.float32(maximum)), levels))


def _std_cumulative(x):
    """Standard normal CDF as 0.5*erfc(-x/sqrt(2)) (numerically robust tails)."""
    half = jnp.float32(0.5)
    const = jnp.float32(-(2 ** -0.5))
    return half * jax.lax.erfc(const * x)


class GaussianConditional:
    """Stateless functional form; scales come from the hyper-synthesis net.

    Unlike the EntropyBottleneck this model has no learnable parameters, so
    it is a plain namespace of pure functions rather than a flax module.
    """

    @staticmethod
    def likelihood(values, scales):
        """values, scales broadcastable NHWC tensors -> elementwise likelihood.

        NOTE: broadcasting between values and scales is deliberate — the
        reference's as-built geometry broadcasts y (B,M,1,1) against
        scales (B,M,4,4) at 256px input (SURVEY.md §2.4 "critical geometry
        quirk"); reproducing that requires plain numpy-style broadcast here.
        """
        scales = lower_bound(scales.astype(jnp.float32), SCALE_BOUND)
        v = jnp.abs(values.astype(jnp.float32))
        upper = _std_cumulative((0.5 - v) / scales)
        lower = _std_cumulative((-0.5 - v) / scales)
        return lower_bound(upper - lower, LIKELIHOOD_BOUND)

    @staticmethod
    def quantize(values, rng=None, training: bool = True):
        if training:
            return quantize_noise(values, rng)
        return quantize_round(values)

    @staticmethod
    def __call__(values, scales, rng=None, training: bool = True):
        v_hat = GaussianConditional.quantize(values, rng, training)
        return v_hat, GaussianConditional.likelihood(v_hat, scales)

    @staticmethod
    def build_indexes(scales, scale_table=None):
        """Map each sigma to the smallest table entry >= sigma (bucket index)."""
        if scale_table is None:
            scale_table = get_scale_table()
        scales = jnp.maximum(scales, SCALE_BOUND)
        indexes = jnp.full(scales.shape, len(scale_table) - 1, jnp.int32)
        for s in scale_table[:-1][::-1]:
            indexes -= (scales <= s).astype(jnp.int32)
        return indexes


def gc_pmf(scale_table):
    """Per-table-entry pmf over the centered integer support.

    Returns (pmf (L, max_length), tail_mass (L,), pmf_length (L,),
    offset (L,)). Mirrors GaussianConditional.update() semantics.
    """
    import numpy as np
    from scipy.stats import norm  # host-side only

    scale_table = np.asarray(scale_table, np.float64)
    multiplier = -norm.ppf(TAIL_MASS / 2)
    pmf_center = np.ceil(scale_table * multiplier).astype(np.int64)
    pmf_length = 2 * pmf_center + 1
    max_length = int(pmf_length.max())

    samples = np.abs(
        np.arange(max_length, dtype=np.int64)[None, :] - pmf_center[:, None]
    ).astype(np.float64)
    s = scale_table[:, None]

    def phi(x):
        from scipy.special import erfc
        return 0.5 * erfc(-(2 ** -0.5) * x)

    upper = phi((0.5 - samples) / s)
    lower = phi((-0.5 - samples) / s)
    pmf = upper - lower
    tail_mass = 2 * lower[:, 0]
    offset = -pmf_center
    return pmf, tail_mass, pmf_length, offset
