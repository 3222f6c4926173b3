"""Import reference (PyTorch/CompressAI) checkpoints into mmnc_tpu params.

The reference persists torch state_dicts whose module tree is
(src/models/multi_task_compressor.py / mixed/disjoint/shared variants):

    model.input_heads.{t}.{seq}.{weight|bias}          conv at even seq
    model.input_heads.{t}.{seq}.{beta|gamma}           GDN at odd seq
    model.compressor.g_a.{0,2,4,6}.*  / g_a.{1,3,5}.{beta,gamma}
    model.compressor.g_s.*            (absent for disjoint/shared)
    model.compressor.h_a.{0,2,4}.*    (ReLU between)
    model.compressor.h_s.{0,2,4}.*
    model.compressor.entropy_bottleneck.{_matrix{k},_bias{k},_factor{k},quantiles}
    model.output_heads.{t}.{seq}.*    (mixed: flat Sequential;
                                       disjoint/shared: 4 deconvs + nested
                                       Sequential at index 7)
    loss_balancer.log_vars

Weight-layout conversions:
    Conv2d          (O,I,kh,kw)  -> (kh,kw,I,O)         transpose
    ConvTranspose2d (I,O,kh,kw)  -> flip(kh,kw) of (kh,kw,I,O)
      (torch transposed conv correlates with the flipped kernel; our deconv
       is an lhs-dilated cross-correlation — tests/test_ops.py proves the
       equivalence)
    GDN beta/gamma: CompressAI stores reparam-space values (same sqrt
      parameterization we use) -> copied directly. `raw_gdn=True` treats
      them as effective values and applies the reparam init instead.
    EntropyBottleneck _matrix/_bias/_factor/quantiles: same shapes, copied.
"""

from typing import Dict

import numpy as np

from ..ops.layers import nonneg_init


def convert_conv_weight(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def convert_deconv_weight(w) -> np.ndarray:
    w = np.transpose(np.asarray(w), (2, 3, 0, 1))  # (kh,kw,I,O)
    return w[::-1, ::-1].copy()


def _gdn(dst: Dict, beta, gamma, raw_gdn: bool):
    import jax.numpy as jnp
    beta = np.asarray(beta)
    gamma = np.asarray(gamma)
    if raw_gdn:
        beta = np.asarray(nonneg_init(jnp.asarray(beta)))
        gamma = np.asarray(nonneg_init(jnp.asarray(gamma)))
    dst["beta"] = beta.astype(np.float32)
    dst["gamma"] = gamma.astype(np.float32)


def _convert_sequential(prefix: str, sd: Dict, conv_strides: Dict[int, str],
                        raw_gdn: bool) -> Dict:
    """Map one torch Sequential of convs/deconvs/GDNs to a flax head tree.

    conv_strides: {seq_index: kind} with kind in {conv, deconv, gdn}.
    Produces flax auto-names Conv_0.., Deconv_0.., GDN_0.. in seq order.
    """
    out: Dict = {}
    counters = {"conv": 0, "deconv": 0, "gdn": 0}
    for seq in sorted(conv_strides):
        kind = conv_strides[seq]
        if kind == "gdn":
            node: Dict = {}
            _gdn(node, sd[f"{prefix}.{seq}.beta"], sd[f"{prefix}.{seq}.gamma"],
                 raw_gdn)
            out[f"GDN_{counters['gdn']}"] = node
            counters["gdn"] += 1
        else:
            w = sd[f"{prefix}.{seq}.weight"]
            kernel = (convert_conv_weight(w) if kind == "conv"
                      else convert_deconv_weight(w))
            name = "Conv" if kind == "conv" else "Deconv"
            out[f"{name}_{counters[kind]}"] = {
                "kernel": kernel.astype(np.float32),
                "bias": np.asarray(sd[f"{prefix}.{seq}.bias"], np.float32),
            }
            counters[kind] += 1
    return out


def _layout(kinds):
    """['conv','gdn',...] -> {seq_index: kind}."""
    return dict(enumerate(kinds))


_ENC_HEAD = _layout(["conv", "gdn"] * 6)
_DEC_HEAD = _layout(["deconv", "gdn", "conv", "gdn", "deconv", "gdn",
                     "conv", "gdn", "deconv", "gdn", "deconv", "gdn", "conv"])
_UPSAMPLE = _layout(["deconv", "gdn", "deconv", "gdn", "deconv", "gdn",
                     "deconv"])
_G_A = _layout(["conv", "gdn", "conv", "gdn", "conv", "gdn", "conv"])
_G_S = _layout(["deconv", "gdn", "deconv", "gdn", "deconv", "gdn", "deconv"])
_H_A = {0: "conv", 2: "conv", 4: "conv"}
_H_S = {0: "deconv", 2: "deconv", 4: "conv"}


def import_reference_state_dict(state_dict, model, raw_gdn: bool = False
                                ) -> Dict:
    """torch state_dict (reference naming) -> flax params for `model`.

    model: a MultiTaskCompressorBase instance (defines variant/task count).
    Returns the params pytree ({"params": ...} NOT included).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict = {}
    t_count = model.n_tasks

    for t in range(t_count):
        params[f"input_heads_{t}"] = _convert_sequential(
            f"model.input_heads.{t}", sd, _ENC_HEAD, raw_gdn)

    comp: Dict = {}
    comp["g_a"] = _convert_sequential("model.compressor.g_a", sd, _G_A,
                                      raw_gdn)
    if model.variant == "mixed":
        comp["g_s"] = _convert_sequential("model.compressor.g_s", sd, _G_S,
                                          raw_gdn)
    comp["h_a"] = _convert_sequential("model.compressor.h_a", sd, _H_A,
                                      raw_gdn)
    comp["h_s"] = _convert_sequential("model.compressor.h_s", sd, _H_S,
                                      raw_gdn)

    eb: Dict = {}
    k = 0
    while f"model.compressor.entropy_bottleneck._matrix{k}" in sd:
        eb[f"matrix_{k}"] = sd[
            f"model.compressor.entropy_bottleneck._matrix{k}"].astype(np.float32)
        eb[f"bias_{k}"] = sd[
            f"model.compressor.entropy_bottleneck._bias{k}"].astype(np.float32)
        fkey = f"model.compressor.entropy_bottleneck._factor{k}"
        if fkey in sd:
            eb[f"factor_{k}"] = sd[fkey].astype(np.float32)
        k += 1
    qkey = "model.compressor.entropy_bottleneck.quantiles"
    if qkey in sd:
        eb["quantiles"] = sd[qkey].astype(np.float32)
    if eb:
        comp["entropy_bottleneck"] = eb
    params["compressor"] = comp

    for t in range(t_count):
        prefix = f"model.output_heads.{t}"
        if model.variant == "mixed":
            params[f"output_heads_{t}"] = _convert_sequential(
                prefix, sd, _DEC_HEAD, raw_gdn)
        else:
            # disjoint/shared: 4-deconv upsample stack then nested head
            params[f"upsamples_{t}"] = _convert_sequential(
                prefix, sd, _UPSAMPLE, raw_gdn)
            params[f"output_heads_{t}"] = _convert_sequential(
                f"{prefix}.7", sd, _DEC_HEAD, raw_gdn)

    if "loss_balancer.log_vars" in sd and model.weighting == "uncertainty":
        params["log_vars"] = sd["loss_balancer.log_vars"].astype(np.float32)

    return params
