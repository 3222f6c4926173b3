"""Software-pipelined batch streaming for real coding.

The axon PJRT backend does not support io_callback (host callbacks inside
jit), so the compress/decompress pipeline is host-orchestrated. This module
keeps the chip busy anyway: device work for batch i+1 is dispatched BEFORE
the host range-codes batch i, so the sequential rANS (and D2H transfers)
overlap with the next batch's convolutions.

Pipeline stages per batch:
  A. device: heads+g_a+h_a+quantize+indexes   (_compress_device)
  B. host:   rANS encode y/z, rANS decode z
  C. device: h_s -> scales -> Gaussian indexes (_decompress_indexes)
  D. host:   rANS decode y
  E. device: g_s + output heads                (_decompress_synthesize)
"""

from typing import Iterable, Iterator, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..entropy import rans


def stream_roundtrip(model, variables, tables, batches: Iterable,
                     ) -> Iterator[Tuple[dict, int]]:
    """Compress+decompress a stream of batches, software-pipelined.

    Yields (x_hats, n_bytes) per input batch, in order. Equivalent to
    calling model.compress + model.decompress per batch, but the device
    never idles while the host range-codes.
    """
    it = iter(batches)

    def dispatch_compress():
        try:
            b = next(it)
        except StopIteration:
            return None
        return model._compress_device(variables, b)

    inflight = dispatch_compress()
    pending_synthesis = []  # (x_hats_future, n_bytes)

    while inflight is not None:
        y_sym, z_sym, indexes = jax.device_get(inflight)
        # keep the chip busy with the next batch while we range-code this one
        inflight = dispatch_compress()

        b, zh, zw, zc = z_sym.shape
        y_shape = y_sym.shape[1:3]
        z_idx = np.broadcast_to(
            np.arange(zc, dtype=np.int32), z_sym.shape).ravel()

        # packed streams: one rANS call per stream for the whole batch
        # (amortizes both the 8-byte state flush and the Python call cost)
        ys = rans.encode_with_indexes(y_sym.ravel(), indexes.ravel(),
                                      tables.gc)
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
        pending_synthesis.append((x_hats, n_bytes))

        # yield completed batches once the next device work is in flight
        while len(pending_synthesis) > 1:
            yield pending_synthesis.pop(0)

    for item in pending_synthesis:
        yield item
