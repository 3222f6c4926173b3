"""Benchmark: compress+decompress throughput of the single-task rgb codec
(BASELINE.json primary metric: MP/s/chip, CLEVR config, 128 latents).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MP/s", "vs_baseline": N, ...}

vs_baseline divides by a reference-equivalent torch-CPU pipeline measured
in-process (the reference publishes no throughput; see
benchmarks/torch_baseline.py). Runs on whatever jax.devices() provides
(the real TPU under the driver).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import numpy as np
import jax
import jax.numpy as jnp


V5E_PEAK_FLOPS = 197e12  # bf16 peak of one TPU v5e chip


def _roundtrip_flops(model, variables, batch, stream_impl="v2"):
    """Analytic FLOPs of the device programs the streaming pipeline
    actually dispatches per batch (impl-dependent: v2 = fused compress +
    synthesize, v1 = lean compress + index program + synthesize), from
    XLA's own cost model (jit(...).lower().compile().cost_analysis())."""
    def flops(lowered):
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))

    y_sym, z_sym, _ = jax.eval_shape(
        lambda v, b: model._compress_device_lean(v, b), variables, batch)
    y_shape = tuple(y_sym.shape[1:3])
    y_hat = jnp.zeros(
        (z_sym.shape[0], *y_shape, model.latent_channels), jnp.int16)
    cls = type(model)
    total = flops(cls._synthesize_from_symbols.lower(model, variables, y_hat))
    if stream_impl == "v2":
        total += flops(cls._compress_device_fused.lower(
            model, variables, batch))
    else:
        z = jnp.zeros(z_sym.shape, jnp.int16)
        total += (
            flops(cls._compress_device_lean.lower(model, variables, batch))
            + flops(cls._decompress_indexes_u8.lower(
                model, variables, z, y_shape)))
    return total


def measure_tpu_mps(batch_size=512, image_size=256, iters=8,
                    conv_channels=100, latent=128, dtype=None,
                    stream_impl="v2"):
    """Steady-state compress+decompress throughput. Large batches amortize
    the per-call dispatch/transfer overhead of the tunneled TPU; falls back
    to smaller batches on OOM. dtype=bfloat16 measures the documented fast
    path (activations bf16, entropy/loss math f32; the coded bitstream
    round-trips bit-exactly against the model's own eval forward)."""
    from mmnc_tpu.models import build_model

    kwargs = {} if dtype is None else {"dtype": dtype}
    model = build_model(1, ["rgb"], latent_channels=latent,
                        conv_channels=conv_channels, lmbda=1e-2, **kwargs)
    rng = np.random.default_rng(0)

    from mmnc_tpu.models.streaming import stream_roundtrip

    sizes = (batch_size, batch_size // 2, batch_size // 4, batch_size // 16)
    for bs in sizes:
        try:
            batch = {"rgb": jnp.asarray(
                rng.random((bs, image_size, image_size, 3), np.float32))}
            variables = model.init(jax.random.PRNGKey(0), batch)
            tables = model.update_bottleneck_values(variables)

            # warmup (compiles the device paths, builds the native coder)
            for x_hats, _ in stream_roundtrip(model, variables, tables,
                                              [batch] * 2,
                                              impl=stream_impl):
                jax.block_until_ready(x_hats)

            t0 = time.perf_counter()
            results = list(stream_roundtrip(model, variables, tables,
                                            [batch] * iters,
                                            impl=stream_impl))
            jax.block_until_ready(results[-1][0])
            dt = (time.perf_counter() - t0) / iters

            flops = _roundtrip_flops(model, variables, batch, stream_impl)
            util = flops / dt / V5E_PEAK_FLOPS
            return bs * image_size * image_size / 1e6 / dt, bs, util
        except Exception as e:  # noqa: BLE001 — retry smaller on OOM-shaped
            # OOM surfaces in several shapes on this stack (RESOURCE_EXHAUSTED
            # from the runtime, INTERNAL/HTTP 500 from the remote AOT compiler
            # when the program exceeds HBM); only those are worth retrying at
            # a smaller batch — anything else (shape/dtype bugs) surfaces NOW
            msg = f"{type(e).__name__}: {e}"
            # status-code substrings only: "XlaRuntimeError" is the exception
            # TYPE of virtually every XLA failure (incl. INVALID_ARGUMENT
            # shape bugs) and must not trigger the retry-smaller path
            oom_shaped = any(s in msg for s in (
                "RESOURCE_EXHAUSTED", "Resource exhausted", "out of memory",
                "OOM", "INTERNAL", "500"))
            if bs == sizes[-1] or not oom_shaped:
                raise
            print(f"batch {bs} failed ({msg[:140]}), retrying smaller",
                  file=sys.stderr)
    raise RuntimeError("all batch sizes failed")


def _wait_for_backend(max_wait_s=900):
    """The axon tunnel sometimes goes UNAVAILABLE for a while (a SIGKILLed
    TPU python leaves the terminal session claim held) and backend init then
    HANGS ~25 min before raising — so probe in a subprocess with a timeout
    and retry until the tunnel answers or the budget runs out."""
    import subprocess
    deadline = time.time() + max_wait_s
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=150, capture_output=True)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            print("backend probe never succeeded; proceeding anyway",
                  file=sys.stderr)
            return
        print("backend unavailable, retrying in 60s", file=sys.stderr)
        time.sleep(60)


def _set_deconv_impl(impl):
    """Select the k5/s2 deconv lowering for subsequent traces. The jitted
    programs cache on shapes, not on this module global, so the jax caches
    must be dropped to force a re-trace (the persistent on-disk compile
    cache still makes the recompile cheap)."""
    from mmnc_tpu.ops import layers
    layers._DECONV_IMPL = impl
    jax.clear_caches()


def _set_conv_s2d(impl):
    """Select the small-Cin k5/s2 conv lowering ("s2d" space-to-depth vs
    "direct"); see _set_deconv_impl for the cache note."""
    from mmnc_tpu.ops import layers
    layers._CONV_S2D_IMPL = impl
    jax.clear_caches()


def main():
    _wait_for_backend()
    # headline = the TPU-native fast path (bf16 activations); the f32 path
    # is measured and reported alongside. Both code real rANS bitstreams
    # whose decode is bit-exact vs the model's own eval forward.
    value_f32, bs, util = measure_tpu_mps()
    precision = "bf16"
    # Autotune the bf16 path along two axes, measured not assumed:
    #  * stream impl: "v2" (2 device programs/batch, fused compress carries
    #    the decoder's indexes) vs "v1" (3 programs; models/streaming.py) —
    #    byte-identical streams (tests/test_streaming.py);
    #  * synthesis deconv lowering on the winning stream impl: "dilated"
    #    (one conv_general_dilated) vs "packed" (one dense k3 conv with 4x
    #    output channels + depth-to-space; mmnc_tpu/ops/layers.py) —
    #    value-equivalent (tests/test_ops.py).
    by_impl = {}    # deconv lowering -> result (on the winning stream impl)
    by_stream = {}  # stream impl -> result (dilated deconv)
    try:
        for simpl in ("v2", "v1"):
            by_stream[simpl] = measure_tpu_mps(batch_size=bs,
                                               dtype=jnp.bfloat16,
                                               stream_impl=simpl)
        stream_impl = max(by_stream, key=lambda k: by_stream[k][0])
        by_impl["dilated"] = by_stream[stream_impl]
        _set_deconv_impl("packed")
        by_impl["packed"] = measure_tpu_mps(batch_size=bs,
                                            dtype=jnp.bfloat16,
                                            stream_impl=stream_impl)
        deconv_impl = max(by_impl, key=lambda k: by_impl[k][0])
        if deconv_impl != "packed":
            _set_deconv_impl(deconv_impl)
        # third axis: the input head's small-Cin conv lowering ("s2d"
        # space-to-depth vs "direct"), on the winning stream+deconv combo
        by_conv0 = {"direct": by_impl[deconv_impl]}
        _set_conv_s2d("s2d")
        by_conv0["s2d"] = measure_tpu_mps(batch_size=bs,
                                          dtype=jnp.bfloat16,
                                          stream_impl=stream_impl)
        conv0_impl = max(by_conv0, key=lambda k: by_conv0[k][0])
        value, bs16, util16 = by_conv0[conv0_impl]
    except Exception as e:  # noqa: BLE001 — fall back to the f32 figure
        print(f"bf16 measurement failed: {e}", file=sys.stderr)
        by_conv0 = {}
        conv0_impl = "direct"
        if by_stream:
            stream_impl, (value, bs16, util16) = next(iter(by_stream.items()))
            deconv_impl = "dilated"
        else:
            value, bs16, util16 = value_f32, bs, util
            precision = "f32"
            deconv_impl = "dilated"
            stream_impl = "v2"

    try:
        from benchmarks.torch_baseline import measure_torch_mps
        baseline = measure_torch_mps()
    except Exception as e:  # noqa: BLE001
        print(f"baseline measurement failed: {e}", file=sys.stderr)
        baseline = None

    result = {
        "metric": "compress+decompress throughput (single-task rgb, "
                  f"latent 128, conv 100, 256px, {precision} path)",
        "value": round(value, 3),
        "precision": precision,
        "unit": "MP/s",
        "vs_baseline": round(value / baseline, 3) if baseline else None,
        "vs_baseline_f32": round(value_f32 / baseline, 3) if baseline
        else None,  # like-for-like precision vs the f32 torch baseline
        "mps_f32": round(value_f32, 3),
        "baseline_mps_torch_cpu": round(baseline, 3) if baseline else None,
        "baseline_nature": "reference-equivalent ScaleHyperprior pipeline "
                           "(our torch code, not compressai) incl. real rANS "
                           "coding, measured on this box's 1-vCPU torch — "
                           "the reference publishes no MP/s figure",
        "batch_size": bs16,
        "mxu_utilization_pct": round(100 * util16, 2),
        "deconv_impl": deconv_impl,
        "mps_bf16_by_deconv_impl": {k: round(v[0], 3)
                                    for k, v in by_impl.items()},
        "stream_impl": stream_impl,
        "mps_bf16_by_stream_impl": {k: round(v[0], 3)
                                    for k, v in by_stream.items()},
        "conv0_impl": conv0_impl,
        "mps_bf16_by_conv0_impl": {k: round(v[0], 3)
                                   for k, v in by_conv0.items()},
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
