"""Software-pipelined batch streaming for real coding.

The axon PJRT backend does not support io_callback (host callbacks inside
jit), so the compress/decompress pipeline is host-orchestrated. Design:

* the MAIN thread dispatches the device-side compress of up to `depth`
  batches ahead (jax dispatch is async and thread-safe) — the chip's queue
  never drains;
* a small CODER pool handles everything serialized per batch: D2H of the
  symbols, packed rANS encode of y/z + z decode (one native call per
  stream; ctypes releases the GIL so coding genuinely overlaps), dispatch
  of the scale-synthesis (device), y decode, and dispatch of the final
  synthesis (device);
* results are yielded in order.

Pipeline stages per batch, v1 layout (transfer-lean — the tunneled host
link runs at ~0.3-1 GB/s, so bytes crossing it are the scarce resource):
  A. device: heads+g_a+h_a+quantize -> int16 y/z symbols (_compress_device_lean)
  B. host:   packed rANS encode z, decode z            (int16 native path)
  C. device: h_s -> scales -> Gaussian indexes as uint8 (_decompress_indexes_u8)
  B'. host:  packed rANS encode y with the DECODER's indexes, decode y
  E. device: g_s + output heads from int16 symbols     (_synthesize_from_symbols)

v2 layout (default): stage C folds into A (_compress_device_fused returns
the u8 indexes alongside the symbols), so each batch costs TWO device
programs and ONE D2H sync instead of three and two. Sound because z's
rANS coding is lossless — the decoder's index input (decoded z) is
bit-identical to the encoder's quantized z; the host asserts that
equality per batch before trusting the stream and falls back to the v1
index recompute if it ever failed. On this dispatch-latency-bound
tunneled link, fewer programs/syncs per batch is the scarce resource
after bytes (see DESIGN.md).

Unlike the classic model.compress() program, stage A ships NO index planes:
y's CDF-row indexes are recomputed on device from the decoded z (stage C) —
bit-identical to what the encoder would compute, since z round-trips
exactly — so the encoder and decoder share one index computation and the
biggest D2H buffer disappears. Streams are equivalent to
model.compress(packed=True) — byte-identical in practice (asserted in
tests/test_streaming.py), though the u8 index program is a separately
jitted computation, so XLA fusion differences could in principle flip a
build_indexes bin at a scale-table boundary; round-trips stay exact
either way because encode and decode share the same index program.
"""

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..entropy import rans

_I16_LIMIT = 2 ** 15 - 1


def _default_impl() -> str:
    return os.environ.get("MMNC_STREAM_IMPL", "v2")


def _roundtrip_one(model, variables, tables, batch, dev_triple):
    """Stages B-E for one batch (runs on a coder thread)."""
    y_sym, z_sym, max_abs = jax.device_get(dev_triple)
    if int(max_abs) >= _I16_LIMIT:  # int16 narrowing would have wrapped
        return _roundtrip_one_wide(model, variables, tables, batch)
    b, zh, zw, zc = z_sym.shape
    y_shape = y_sym.shape[1:3]
    z_idx = np.broadcast_to(
        np.arange(zc, dtype=np.int32), z_sym.shape).ravel()

    zs = rans.encode_with_indexes(z_sym.ravel(), z_idx, tables.eb)
    z_dec = rans.decode_with_indexes(zs, z_idx, tables.eb,
                                     out_dtype=np.int16
                                     ).reshape(b, zh, zw, zc)

    dec_idx = jax.device_get(model._decompress_indexes_u8(
        variables, jnp.asarray(z_dec), tuple(y_shape)))

    ys = rans.encode_with_indexes(y_sym.ravel(), dec_idx.ravel(), tables.gc)
    n_bytes = len(ys) + len(zs)

    m = model.latent_channels
    y_hat = rans.decode_with_indexes(ys, dec_idx.ravel(), tables.gc,
                                     out_dtype=np.int16
                                     ).reshape(b, *y_shape, m)
    x_hats = model._synthesize_from_symbols(variables, jnp.asarray(y_hat))
    return x_hats, n_bytes


def _roundtrip_one_v2(model, variables, tables, batch, dev_quad):
    """Stages B-E for one batch in the 2-program layout: the compress
    dispatch already carried the decoder's y indexes (u8), computed from
    quantized z on device. z's rANS coding is lossless, so those indexes
    equal what the decoder would recompute from decoded z — asserted here
    per batch (z_dec == z_sym) before the stream is used; on a mismatch
    (never observed; would mean a coder bug) fall back to recomputing the
    indexes from the decoded z like the v1 pipeline."""
    y_sym, z_sym, dec_idx, max_abs = jax.device_get(dev_quad)
    if int(max_abs) >= _I16_LIMIT:  # int16 narrowing would have wrapped
        return _roundtrip_one_wide(model, variables, tables, batch)
    b, zh, zw, zc = z_sym.shape
    y_shape = y_sym.shape[1:3]
    z_idx = np.broadcast_to(
        np.arange(zc, dtype=np.int32), z_sym.shape).ravel()

    zs = rans.encode_with_indexes(z_sym.ravel(), z_idx, tables.eb)
    z_dec = rans.decode_with_indexes(zs, z_idx, tables.eb,
                                     out_dtype=np.int16)
    if not np.array_equal(z_dec, z_sym.ravel()):  # lossless-coding guard
        dec_idx = jax.device_get(model._decompress_indexes_u8(
            variables, jnp.asarray(z_dec.reshape(b, zh, zw, zc)),
            tuple(y_shape)))

    ys = rans.encode_with_indexes(y_sym.ravel(), dec_idx.ravel(), tables.gc)
    n_bytes = len(ys) + len(zs)

    m = model.latent_channels
    y_hat = rans.decode_with_indexes(ys, dec_idx.ravel(), tables.gc,
                                     out_dtype=np.int16
                                     ).reshape(b, *y_shape, m)
    x_hats = model._synthesize_from_symbols(variables, jnp.asarray(y_hat))
    return x_hats, n_bytes


def _roundtrip_one_wide(model, variables, tables, batch):
    """int32 fallback when a symbol overflows int16 (pathological inputs);
    recomputes the classic compress program with index planes."""
    y_sym, z_sym, indexes = jax.device_get(
        model._compress_device(variables, batch))
    b, zh, zw, zc = z_sym.shape
    y_shape = y_sym.shape[1:3]
    z_idx = np.broadcast_to(
        np.arange(zc, dtype=np.int32), z_sym.shape).ravel()

    ys = rans.encode_with_indexes(y_sym.ravel(), indexes.ravel(), tables.gc)
    zs = rans.encode_with_indexes(z_sym.ravel(), z_idx, tables.eb)
    n_bytes = len(ys) + len(zs)
    z_dec = rans.decode_with_indexes(zs, z_idx, tables.eb
                                     ).reshape(b, zh, zw, zc)

    dec_idx = jax.device_get(model._decompress_indexes(
        variables, jnp.asarray(z_dec), tuple(y_shape)))

    m = model.latent_channels
    y_hat = rans.decode_with_indexes(ys, dec_idx.ravel(), tables.gc
                                     ).reshape(b, *y_shape, m
                                               ).astype(np.float32)
    x_hats = model._decompress_synthesize(variables, jnp.asarray(y_hat))
    return x_hats, n_bytes


def stream_roundtrip(model, variables, tables, batches: Iterable,
                     depth: int = 3, coder_threads: int = 2,
                     impl: str = None,
                     ) -> Iterator[Tuple[dict, int]]:
    """Compress+decompress a stream of batches, software-pipelined.

    Yields (x_hats, n_bytes) per input batch, in order. Equivalent to
    calling model.compress + model.decompress per batch, but device work
    for up to `depth`+1 batches stays in flight (the guard runs after the
    newest dispatch) while the host range-codes — size HBM headroom for
    depth+1 batches' intermediates.

    impl selects the device-program layout (default env MMNC_STREAM_IMPL,
    else "v2"): "v2" = 2 programs/batch (fused compress carries the
    decoder's y indexes; one D2H sync), "v1" = 3 programs/batch (indexes
    recomputed from uploaded decoded z). Streams are byte-identical;
    bench.py A/Bs both.
    """
    impl = impl or _default_impl()
    if impl not in ("v1", "v2"):
        raise ValueError(f"unknown stream impl {impl!r}")
    compress = (model._compress_device_fused if impl == "v2"
                else model._compress_device_lean)
    roundtrip = _roundtrip_one_v2 if impl == "v2" else _roundtrip_one
    ex = ThreadPoolExecutor(coder_threads)
    try:
        futures = []
        for batch in batches:
            dev = compress(variables, batch)  # async
            futures.append(ex.submit(
                roundtrip, model, variables, tables, batch, dev))
            while len(futures) > depth:
                yield futures.pop(0).result()
        for f in futures:
            yield f.result()
    finally:
        ex.shutdown(wait=False)
