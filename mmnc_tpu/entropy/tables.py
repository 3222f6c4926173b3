"""Quantized-CDF table construction for real range coding.

Host-side (numpy) mirror of the reference dependency's table-update path:
EntropyBottleneck.update() / GaussianConditional.update_scale_table()
(SURVEY.md X2/X3, invoked by the reference via update_bottleneck_values(),
src/models/multi_task_compressor.py:486-489) and the C++ pmf->CDF quantizer
compressai._CXX.pmf_to_quantized_cdf (SURVEY.md X5).

The authoritative pmf_to_quantized_cdf lives in native/rans/rans.cpp (it is
what the encoder/decoder use); `pmf_to_quantized_cdf_np` here is a pure-numpy
mirror used for table building and tested for equality against the C++ one.

Semantics (must match bit-for-bit between builder and coder):
* cdf has pmf_len + 1 entries, cdf[0] = 0, cdf[-1] = 2^16;
* each pmf bin is rounded to freq = round(p * 2^16), then rescaled by
  total so the CDF tops out at exactly 2^16;
* every symbol is forced to nonzero frequency by stealing one count from
  the lowest-frequency symbol with freq > 1.
"""

from dataclasses import dataclass

import numpy as np

PRECISION = 16


def pmf_to_quantized_cdf_np(pmf: np.ndarray, precision: int = PRECISION) -> np.ndarray:
    pmf = np.asarray(pmf, np.float64)
    if np.any(pmf < 0) or not np.all(np.isfinite(pmf)):
        raise ValueError("invalid pmf (negative or non-finite entries)")
    freqs = np.round(pmf * (1 << precision)).astype(np.uint64)
    total = int(freqs.sum())
    if total == 0:
        raise ValueError("pmf is all-zero")
    cdf = np.zeros(len(pmf) + 1, np.int64)
    cdf[1:] = ((freqs * (1 << precision)) // total).astype(np.int64)
    cdf = np.cumsum(cdf)
    cdf[-1] = 1 << precision

    for i in range(len(cdf) - 1):
        if cdf[i] == cdf[i + 1]:
            freq = cdf[1:] - cdf[:-1]
            candidates = np.where(freq > 1)[0]
            if len(candidates) == 0:
                raise ValueError("cannot normalize cdf: no mass to steal")
            best = candidates[np.argmin(freq[candidates])]
            if best < i:
                cdf[best + 1:i + 1] -= 1
            else:
                cdf[i + 1:best + 1] += 1
    return cdf.astype(np.int32)


@dataclass
class CdfTable:
    """Everything the rANS coder needs: one CDF row per index bucket."""
    cdfs: np.ndarray         # (rows, max_cdf_len) int32, zero-padded
    cdf_lengths: np.ndarray  # (rows,) int32 — valid entries per row
    offsets: np.ndarray      # (rows,) int32 — symbol = value - offset

    @property
    def max_values(self) -> np.ndarray:
        """Per-row largest in-range symbol (the escape symbol)."""
        return self.cdf_lengths - 2


def _rows_to_table(pmf, tail_mass, pmf_length, offset) -> CdfTable:
    pmf = np.asarray(pmf, np.float64)
    tail_mass = np.asarray(tail_mass, np.float64)
    pmf_length = np.asarray(pmf_length, np.int64)
    rows = pmf.shape[0]
    max_len = int(pmf_length.max()) + 2
    cdfs = np.zeros((rows, max_len + 1), np.int32)
    for r in range(rows):
        n = int(pmf_length[r])
        prob = np.concatenate([pmf[r, :n], [max(tail_mass[r], 0.0)]])
        cdf = pmf_to_quantized_cdf_np(prob)
        cdfs[r, :len(cdf)] = cdf
    return CdfTable(
        cdfs=cdfs,
        cdf_lengths=(pmf_length + 2).astype(np.int32),
        offsets=np.asarray(offset, np.int32),
    )


def build_eb_table(params: dict, quantiles: np.ndarray):
    """Build the EntropyBottleneck coding table from trained params.

    params: the flax param dict of the EntropyBottleneck (host numpy).
    Returns (CdfTable, medians (C,) float32).
    """
    import jax.numpy as jnp
    from .entropy_bottleneck import eb_pmf

    quantiles = np.asarray(quantiles, np.float64)
    medians = quantiles[:, 0, 1]
    minima = np.clip(np.ceil(medians - quantiles[:, 0, 0]), 0, None).astype(np.int64)
    maxima = np.clip(np.ceil(quantiles[:, 0, 2] - medians), 0, None).astype(np.int64)
    pmf_length = minima + maxima + 1
    max_length = int(pmf_length.max())

    jparams = {k: jnp.asarray(v) for k, v in params.items()
               if k.startswith(("matrix_", "bias_", "factor_"))}
    pmf, tail = eb_pmf(jparams, jnp.asarray(quantiles, jnp.float32),
                       max_length, jnp.asarray(minima))
    pmf = np.asarray(pmf, np.float64)
    tail = np.asarray(tail, np.float64)

    table = _rows_to_table(pmf, tail, pmf_length, -minima)
    return table, medians.astype(np.float32)


def build_gc_table(scale_table=None) -> CdfTable:
    """Build the GaussianConditional coding table (one row per table scale)."""
    from .gaussian_conditional import gc_pmf, get_scale_table

    if scale_table is None:
        scale_table = get_scale_table()
    pmf, tail, pmf_length, offset = gc_pmf(np.asarray(scale_table))
    return _rows_to_table(pmf, tail, pmf_length, offset)
