"""Profile the compress+decompress streaming pipeline on the real TPU.

Breaks the bench configuration (single-task rgb, latent 128, conv 100,
256px) into its cost components so the throughput bound is measured, not
guessed (BASELINE.json north-star; VERDICT round-1 'raise real-coding
throughput toward the hardware'):

* per-stage wall time: device compress / D2H / host rANS (y+z) / device
  index synthesis / device final synthesis,
* pipelined steady-state MP/s at several depths and batch sizes,
* optional xplane trace (--trace-dir) for op-level attribution.

    python scripts/profile_roundtrip.py [--batch-size 1024] [--iters 8]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def build(batch_size, image_size=256, conv_channels=100, latent=128):
    from mmnc_tpu.models import build_model

    model = build_model(1, ["rgb"], latent_channels=latent,
                        conv_channels=conv_channels, lmbda=1e-2)
    rng = np.random.default_rng(0)
    batch = {"rgb": jnp.asarray(
        rng.random((batch_size, image_size, image_size, 3), np.float32))}
    variables = model.init(jax.random.PRNGKey(0), batch)
    tables = model.update_bottleneck_values(variables)
    return model, variables, tables, batch


def timed(fn, iters=4):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out) if out is not None else None
    return (time.perf_counter() - t0) / iters


def stage_times(model, variables, tables, batch, iters=4):
    """Per-stage wall times of the transfer-lean pipeline layout
    (models/streaming.py): int16 symbols, uint8 indexes, y encoded with the
    decoder's device-recomputed indexes."""
    from mmnc_tpu.entropy import rans

    out = {}
    # A: device compress (heads+g_a+h_a+quantize; no h_s/indexes)
    out["A_compress_device"] = timed(
        lambda: jax.block_until_ready(
            model._compress_device_lean(variables, batch)), iters)
    # A2: the v2 fused compress (g_a+h_a+quantize+h_s+indexes in ONE
    # program — replaces A and C in the v2 pipeline layout)
    out["A2_compress_fused_device"] = timed(
        lambda: jax.block_until_ready(
            model._compress_device_fused(variables, batch)), iters)
    dev = model._compress_device_lean(variables, batch)
    # D2H of the int16 symbol pair — device_get caches the host copy on the
    # array, so each timed iteration must fetch a FRESH (copied) triple
    fresh = jax.jit(lambda t: jax.tree.map(lambda a: a + 0, t))

    def d2h():
        t = fresh(dev)
        jax.block_until_ready(t)
        t0 = time.perf_counter()
        jax.device_get(t)
        return time.perf_counter() - t0

    d2h()  # warm the copy jit
    out["D2H_symbols"] = sum(d2h() for _ in range(iters)) / iters
    y_sym, z_sym, _ = jax.device_get(dev)
    b, zh, zw, zc = z_sym.shape
    y_shape = y_sym.shape[1:3]
    z_idx = np.broadcast_to(np.arange(zc, dtype=np.int32),
                            z_sym.shape).ravel()
    # B: host coding of z
    out["B_host_encode_z"] = timed(lambda: rans.encode_with_indexes(
        z_sym.ravel(), z_idx, tables.eb), iters)
    zs = rans.encode_with_indexes(z_sym.ravel(), z_idx, tables.eb)
    out["B_host_decode_z"] = timed(lambda: rans.decode_with_indexes(
        zs, z_idx, tables.eb, out_dtype=np.int16), iters)
    z_dec = rans.decode_with_indexes(zs, z_idx, tables.eb,
                                     out_dtype=np.int16).reshape(z_sym.shape)
    # C: device index synthesis (h_s -> uint8 rows) incl. its D2H
    out["C_decompress_indexes_u8"] = timed(
        lambda: jax.device_get(model._decompress_indexes_u8(
            variables, jnp.asarray(z_dec), tuple(y_shape))), iters)
    dec_idx = jax.device_get(
        model._decompress_indexes_u8(variables, jnp.asarray(z_dec),
                                     tuple(y_shape)))
    # B': host coding of y with the decoder's indexes
    out["B_host_encode_y"] = timed(lambda: rans.encode_with_indexes(
        y_sym.ravel(), dec_idx.ravel(), tables.gc), iters)
    ys = rans.encode_with_indexes(y_sym.ravel(), dec_idx.ravel(), tables.gc)
    out["D_host_decode_y"] = timed(lambda: rans.decode_with_indexes(
        ys, dec_idx.ravel(), tables.gc, out_dtype=np.int16), iters)
    y_hat = rans.decode_with_indexes(
        ys, dec_idx.ravel(), tables.gc, out_dtype=np.int16).reshape(
        b, *y_shape, model.latent_channels)
    # E: device synthesis (g_s + output heads) — the FLOPs-heavy decode
    y_dev = jnp.asarray(y_hat)
    out["E_synthesize_device"] = timed(
        lambda: jax.block_until_ready(
            model._synthesize_from_symbols(variables, y_dev)), iters)
    out["H2D_y_hat_i16"] = timed(lambda: jax.block_until_ready(
        jnp.asarray(y_hat)), iters)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    # 512 default: the batch-1024 compress program needs ~20.5G HBM
    # (> the 15.75G chip) — the 2026-08-18 refresh OOMed at compile
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--out", default="artifacts/profile_roundtrip.json")
    args = ap.parse_args(argv)

    from mmnc_tpu.models.streaming import stream_roundtrip

    model, variables, tables, batch = build(args.batch_size)
    mp = args.batch_size * 256 * 256 / 1e6

    report = {"batch_size": args.batch_size,
              "device": str(jax.devices()[0]),
              "stages_s": stage_times(model, variables, tables, batch)}
    serial = sum(report["stages_s"].values())
    report["serial_sum_s"] = serial
    report["serial_mps"] = mp / serial

    for impl in ("v2", "v1"):
        for depth in (1, 2, 3, 4):
            try:
                for _ in stream_roundtrip(model, variables, tables,
                                          [batch] * 2, depth=depth,
                                          impl=impl):
                    pass
                trace = args.trace_dir and depth == 3 and impl == "v2"
                if trace:
                    jax.profiler.start_trace(args.trace_dir)
                t0 = time.perf_counter()
                results = list(stream_roundtrip(model, variables, tables,
                                                [batch] * args.iters,
                                                depth=depth, impl=impl))
                jax.block_until_ready(results[-1][0])
                dt = (time.perf_counter() - t0) / args.iters
                if trace:
                    jax.profiler.stop_trace()
                report[f"pipelined_mps_depth{depth}_{impl}"] = mp / dt
            except Exception as e:  # noqa: BLE001 — deeper pipelines can OOM
                report[f"pipelined_mps_depth{depth}_{impl}"] = (
                    f"FAILED: {type(e).__name__}")
                break

    # depth x batch matrix: a deeper pipeline holds depth+1 batches of
    # device intermediates in flight, so the HBM-feasible depth depends on
    # the per-stage batch — smaller batches unlock the deeper overlap
    # (VERDICT r2 #4: depth-2 OOMed at batch 512)
    del batch
    report["depth_batch_mps"] = {}
    for bs in (args.batch_size // 2, args.batch_size // 4):
        model, variables, tables, b = build(bs)
        mp_b = bs * 256 * 256 / 1e6
        for depth in (1, 2, 3):
            key = f"b{bs}_d{depth}"
            try:
                for _ in stream_roundtrip(model, variables, tables, [b] * 2,
                                          depth=depth):
                    pass
                n = max(args.iters, 8)
                t0 = time.perf_counter()
                results = list(stream_roundtrip(model, variables, tables,
                                                [b] * n, depth=depth))
                jax.block_until_ready(results[-1][0])
                report["depth_batch_mps"][key] = (
                    mp_b / ((time.perf_counter() - t0) / n))
            except Exception as e:  # noqa: BLE001
                report["depth_batch_mps"][key] = (
                    f"FAILED: {type(e).__name__}")
        del b

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
