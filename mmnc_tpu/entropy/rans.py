"""ctypes bridge to the native rANS coder (native/rans/rans.cpp).

Replaces the reference dependency's pybind11 extension
(compressai.ans RansEncoder/RansDecoder + compressai._CXX, SURVEY.md X4/X5)
with a C-ABI shared library compiled on demand with g++ (pybind11 is not in
this image). The library is cached next to the source and rebuilt only when
the source is newer.

All arrays cross this boundary as contiguous int32 numpy; the device side
(jit region) produces symbols/indexes, and `jax.device_get` feeds them here.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

PRECISION = 16

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "rans", "rans.cpp")
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libmmncrans.so")
_lock = threading.Lock()
_lib = None


def _build_library():
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _LIB_PATH,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        need_build = (not os.path.exists(_LIB_PATH)
                      or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC))
        if need_build:
            _build_library()
        lib = ctypes.CDLL(_LIB_PATH)

        lib.mmnc_pmf_to_quantized_cdf.restype = ctypes.c_int32
        lib.mmnc_pmf_to_quantized_cdf.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32)]

        def _enc(name, sym_t, idx_t):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int64
            fn.argtypes = [
                ctypes.POINTER(sym_t), ctypes.POINTER(idx_t), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]

        def _dec(name, idx_t, out_t):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int32
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(idx_t), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(out_t)]

        _enc("mmnc_rans_encode_with_indexes", ctypes.c_int32, ctypes.c_int32)
        _enc("mmnc_rans_encode_i16u8", ctypes.c_int16, ctypes.c_uint8)
        _enc("mmnc_rans_encode_i16i32", ctypes.c_int16, ctypes.c_int32)
        _dec("mmnc_rans_decode_with_indexes", ctypes.c_int32, ctypes.c_int32)
        _dec("mmnc_rans_decode_u8i16", ctypes.c_uint8, ctypes.c_int16)
        _dec("mmnc_rans_decode_i32i16", ctypes.c_int32, ctypes.c_int16)

        lib.mmnc_rans_decbuckets_build.restype = ctypes.c_int32
        lib.mmnc_rans_decbuckets_build.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint16)]
        def _dec_fast(name, idx_t, out_t):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int32
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(idx_t), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(out_t)]

        _dec_fast("mmnc_rans_decode_fast_u8i16", ctypes.c_uint8,
                  ctypes.c_int16)
        _dec_fast("mmnc_rans_decode_fast_i32i16", ctypes.c_int32,
                  ctypes.c_int16)
        _dec_fast("mmnc_rans_decode_fast_i32i32", ctypes.c_int32,
                  ctypes.c_int32)
        _lib = lib
        return lib


def _i32ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def pmf_to_quantized_cdf(pmf, precision: int = PRECISION) -> np.ndarray:
    """Native CDF quantizer (same semantics as tables.pmf_to_quantized_cdf_np)."""
    lib = _load()
    pmf = np.ascontiguousarray(pmf, np.float32)
    out = np.zeros(len(pmf) + 1, np.int32)
    rc = lib.mmnc_pmf_to_quantized_cdf(
        pmf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(pmf), precision, _i32ptr(out))
    if rc != 0:
        raise ValueError(f"pmf_to_quantized_cdf failed with code {rc}")
    return out


def _prep(table):
    cdfs = np.ascontiguousarray(table.cdfs, np.int32)
    lengths = np.ascontiguousarray(table.cdf_lengths, np.int32)
    offsets = np.ascontiguousarray(table.offsets, np.int32)
    return cdfs, lengths, offsets


# fast-decode acceleration: per CdfTable, a 256-entry-per-row bucket table
# brackets the symbol binary search to one bucket's symbols (usually 0-1
# halving steps) while staying cache-resident — a full 2^16 cum->value LUT
# was measured first and is SLOWER than the plain search (128 KB/row falls
# out of L2). A reciprocal-multiply encode table was likewise measured and
# rejected (the OoO core hides the div/mod behind the renorm stores).
# Stream bytes are identical to the classic path (pinned by
# tests/test_rans.py::test_golden_stream_pinned plus the fast-vs-classic
# property tests). MMNC_RANS_FAST=0 falls back to the classic decode.
_N_BUCKETS = 256


def _fast_tables(table):
    cached = getattr(table, "_mmnc_fast", None)
    if cached is not None:
        return cached
    lib = _load()
    cdfs, lengths, offsets = _prep(table)
    rows = len(lengths)
    buckets = np.empty(rows * _N_BUCKETS, np.uint16)
    rc = lib.mmnc_rans_decbuckets_build(
        _i32ptr(cdfs), cdfs.shape[1], _i32ptr(lengths), rows,
        buckets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
    if rc != 0:
        raise ValueError(f"decbuckets_build failed with code {rc}")
    cached = (buckets, cdfs, lengths, offsets)
    try:
        object.__setattr__(table, "_mmnc_fast", cached)
    except (AttributeError, TypeError):
        pass  # uncacheable table type: rebuild per call
    return cached


def _use_fast() -> bool:
    return os.environ.get("MMNC_RANS_FAST", "1") != "0"


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def encode_with_indexes(symbols, indexes, table) -> bytes:
    """Encode integer symbols with per-symbol CDF-row indexes -> bytestring.

    Dtype-dispatching: (int16 symbols, uint8|int32 indexes) use the typed
    native entry points with NO host-side widening — the 1-vCPU host never
    copies the arrays — and produce bit-identical streams to the int32 path.
    Anything else is widened to the classic int32/int32 call."""
    lib = _load()
    symbols = np.ascontiguousarray(symbols).ravel()
    indexes = np.ascontiguousarray(indexes).ravel()
    if symbols.shape != indexes.shape:
        raise ValueError(
            f"symbols/indexes length mismatch: {symbols.shape} vs {indexes.shape}")
    if symbols.dtype == np.int16 and indexes.dtype == np.uint8:
        fn, s_t, i_t = lib.mmnc_rans_encode_i16u8, ctypes.c_int16, ctypes.c_uint8
    elif symbols.dtype == np.int16 and indexes.dtype == np.int32:
        fn, s_t, i_t = lib.mmnc_rans_encode_i16i32, ctypes.c_int16, ctypes.c_int32
    else:
        symbols = symbols.astype(np.int32, copy=False)
        indexes = indexes.astype(np.int32, copy=False)
        fn, s_t, i_t = (lib.mmnc_rans_encode_with_indexes,
                        ctypes.c_int32, ctypes.c_int32)
    cdfs, lengths, offsets = _prep(table)
    # worst case: every symbol escapes with ~64 bypass bits
    capacity = 16 * len(symbols) + 64
    out = np.empty(capacity, np.uint8)  # encoder overwrites; no memset
    n = fn(
        _ptr(symbols, s_t), _ptr(indexes, i_t), len(symbols),
        _i32ptr(cdfs), cdfs.shape[1], _i32ptr(lengths), _i32ptr(offsets),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), capacity)
    if n < 0:
        raise RuntimeError(f"rANS encode failed with code {n}")
    return out[:n].tobytes()


def decode_with_indexes(data: bytes, indexes, table, out_dtype=np.int32
                        ) -> np.ndarray:
    """Decode a bytestring back to symbols (len == len(indexes)).

    out_dtype=np.int16 writes narrow symbols directly (for H2D-lean paths);
    the native layer errors out (-3) if the stream holds an outlier that
    doesn't fit, so narrowing can never silently corrupt."""
    lib = _load()
    fast = _use_fast()
    indexes = np.ascontiguousarray(indexes).ravel()
    if indexes.dtype != np.uint8:
        indexes = indexes.astype(np.int32, copy=False)
    if out_dtype == np.int16 and indexes.dtype == np.uint8:
        fn = (lib.mmnc_rans_decode_fast_u8i16 if fast
              else lib.mmnc_rans_decode_u8i16)
        i_t, o_t = ctypes.c_uint8, ctypes.c_int16
    elif out_dtype == np.int16:
        fn = (lib.mmnc_rans_decode_fast_i32i16 if fast
              else lib.mmnc_rans_decode_i32i16)
        i_t, o_t = ctypes.c_int32, ctypes.c_int16
    else:
        if indexes.dtype == np.uint8:
            indexes = indexes.astype(np.int32)
        fn = (lib.mmnc_rans_decode_fast_i32i32 if fast
              else lib.mmnc_rans_decode_with_indexes)
        i_t, o_t = ctypes.c_int32, ctypes.c_int32
    buf = np.frombuffer(data, np.uint8)
    buf = np.ascontiguousarray(buf)
    out = np.zeros(len(indexes), out_dtype)
    if fast:
        buckets, cdfs, lengths, offsets = _fast_tables(table)
        rc = fn(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
            _ptr(indexes, i_t), len(indexes),
            _i32ptr(cdfs), cdfs.shape[1], _i32ptr(lengths), _i32ptr(offsets),
            buckets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            _ptr(out, o_t))
    else:
        cdfs, lengths, offsets = _prep(table)
        rc = fn(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
            _ptr(indexes, i_t), len(indexes),
            _i32ptr(cdfs), cdfs.shape[1], _i32ptr(lengths), _i32ptr(offsets),
            _ptr(out, o_t))
    if rc == -3:
        raise OverflowError(
            "rANS decode: stream symbol does not fit the requested int16 output")
    if rc != 0:
        raise RuntimeError(f"rANS decode failed with code {rc}")
    return out
