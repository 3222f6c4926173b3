"""Native rANS coder tests: CDF quantizer parity, round-trip properties,
and real-bytes vs estimated-entropy agreement (the reference's check_bpp
notebook as a pytest; SURVEY.md §4 item 1)."""

import numpy as np

from mmnc_tpu.entropy import rans
from mmnc_tpu.entropy.tables import (
    CdfTable, pmf_to_quantized_cdf_np, build_gc_table, PRECISION)


def _random_table(rng, rows=4, support=16):
    cdfs = []
    lengths = []
    for _ in range(rows):
        n = rng.integers(4, support)
        pmf = rng.random(n) + 1e-4
        pmf = pmf / pmf.sum() * (1 - 1e-6)
        cdf = pmf_to_quantized_cdf_np(np.concatenate([pmf, [1e-6]]))
        cdfs.append(cdf)
        lengths.append(len(cdf))
    max_len = max(lengths)
    mat = np.zeros((rows, max_len), np.int32)
    for r, c in enumerate(cdfs):
        mat[r, :len(c)] = c
    return CdfTable(cdfs=mat, cdf_lengths=np.asarray(lengths, np.int32),
                    offsets=rng.integers(-8, 8, rows).astype(np.int32))


def test_cpp_cdf_quantizer_matches_numpy_mirror():
    rng = np.random.default_rng(0)
    for _ in range(50):
        n = rng.integers(2, 40)
        pmf = rng.random(n).astype(np.float32)
        pmf /= pmf.sum()
        pmf *= 1 - 1e-6
        row = np.concatenate([pmf, [1e-6]]).astype(np.float32)
        got = rans.pmf_to_quantized_cdf(row)
        want = pmf_to_quantized_cdf_np(row)
        np.testing.assert_array_equal(got, want)


def test_cdf_invariants():
    rng = np.random.default_rng(1)
    for _ in range(20):
        n = rng.integers(2, 64)
        pmf = rng.random(n)
        pmf /= pmf.sum()
        cdf = pmf_to_quantized_cdf_np(pmf)
        assert cdf[0] == 0
        assert cdf[-1] == (1 << PRECISION)
        assert np.all(np.diff(cdf) >= 1), "every symbol needs nonzero freq"


def test_roundtrip_in_range_symbols():
    rng = np.random.default_rng(2)
    table = _random_table(rng)
    n = 4096
    indexes = rng.integers(0, len(table.cdf_lengths), n).astype(np.int32)
    max_vals = table.max_values[indexes]
    symbols = (rng.integers(0, 1 << 16, n) % max_vals
               + table.offsets[indexes]).astype(np.int32)
    data = rans.encode_with_indexes(symbols, indexes, table)
    out = rans.decode_with_indexes(data, indexes, table)
    np.testing.assert_array_equal(out, symbols)


def test_roundtrip_with_bypass_symbols():
    """Out-of-range symbols (negative / beyond support) take the escape path."""
    rng = np.random.default_rng(3)
    table = _random_table(rng)
    n = 2048
    indexes = rng.integers(0, len(table.cdf_lengths), n).astype(np.int32)
    symbols = rng.integers(-500, 500, n).astype(np.int32)  # mostly out of range
    data = rans.encode_with_indexes(symbols, indexes, table)
    out = rans.decode_with_indexes(data, indexes, table)
    np.testing.assert_array_equal(out, symbols)


def test_roundtrip_extreme_values():
    rng = np.random.default_rng(4)
    table = _random_table(rng, rows=1)
    symbols = np.asarray([0, 1, -1, 10_000_000, -10_000_000, 65535, -65536],
                         np.int32)
    indexes = np.zeros(len(symbols), np.int32)
    data = rans.encode_with_indexes(symbols, indexes, table)
    out = rans.decode_with_indexes(data, indexes, table)
    np.testing.assert_array_equal(out, symbols)


def test_empty_and_single_symbol():
    rng = np.random.default_rng(5)
    table = _random_table(rng, rows=1)
    for syms in ([], [table.offsets[0] + 1]):
        symbols = np.asarray(syms, np.int32)
        indexes = np.zeros(len(symbols), np.int32)
        data = rans.encode_with_indexes(symbols, indexes, table)
        out = rans.decode_with_indexes(data, indexes, table)
        np.testing.assert_array_equal(out, symbols)


def test_bytes_close_to_entropy_estimate():
    """check_bpp-as-pytest: actual rANS bytes ~= sum(-log2 p) for symbols
    drawn from the coded distribution."""
    rng = np.random.default_rng(6)
    n_sym, support = 200_000, 32
    pmf = rng.random(support)
    pmf /= pmf.sum()
    cdf = pmf_to_quantized_cdf_np(np.concatenate([pmf * (1 - 1e-9), [1e-9]]))
    table = CdfTable(cdfs=cdf[None, :].astype(np.int32),
                     cdf_lengths=np.asarray([len(cdf)], np.int32),
                     offsets=np.asarray([0], np.int32))
    symbols = rng.choice(support, size=n_sym, p=pmf).astype(np.int32)
    indexes = np.zeros(n_sym, np.int32)

    data = rans.encode_with_indexes(symbols, indexes, table)
    out = rans.decode_with_indexes(data, indexes, table)
    np.testing.assert_array_equal(out, symbols)

    est_bits = -np.sum(np.log2(pmf[symbols]))
    actual_bits = len(data) * 8
    assert actual_bits < est_bits * 1.01 + 256, (actual_bits, est_bits)
    assert actual_bits > est_bits * 0.98, "can't beat entropy"


def test_gc_table_builds():
    table = build_gc_table()
    assert table.cdfs.shape[0] == 64
    assert np.all(table.cdf_lengths >= 3)
    # each row's cdf must terminate at 2^16
    for r in range(64):
        assert table.cdfs[r, table.cdf_lengths[r] - 1] == (1 << PRECISION)


def test_typed_paths_bit_identical_and_narrow_decode():
    """int16-symbol / uint8-index native entry points produce the SAME
    stream bytes as the classic int32 path, and the int16 decode output
    matches (incl. bypass outliers that still fit int16)."""
    rng = np.random.default_rng(7)
    table = _random_table(rng, rows=6)
    n = 4096
    indexes = rng.integers(0, 6, n).astype(np.int32)
    symbols = (rng.integers(-40, 40, n)
               + table.offsets[indexes]).astype(np.int32)
    symbols[::97] += 3000  # bypass escapes, int16-representable

    ref = rans.encode_with_indexes(symbols, indexes, table)
    via_i16_u8 = rans.encode_with_indexes(
        symbols.astype(np.int16), indexes.astype(np.uint8), table)
    via_i16_i32 = rans.encode_with_indexes(
        symbols.astype(np.int16), indexes, table)
    assert ref == via_i16_u8 == via_i16_i32

    for idx in (indexes, indexes.astype(np.uint8)):
        out = rans.decode_with_indexes(ref, idx, table, out_dtype=np.int16)
        assert out.dtype == np.int16
        np.testing.assert_array_equal(out, symbols)


def test_narrow_decode_overflow_raises():
    """Decoding a stream whose outlier exceeds int16 into an int16 buffer
    must raise, never silently wrap."""
    import pytest

    rng = np.random.default_rng(3)
    table = _random_table(rng, rows=1)
    symbols = np.array([100000, 0, -1], np.int32)
    indexes = np.zeros(3, np.int32)
    data = rans.encode_with_indexes(symbols, indexes, table)
    np.testing.assert_array_equal(
        rans.decode_with_indexes(data, indexes, table), symbols)
    with pytest.raises(OverflowError):
        rans.decode_with_indexes(data, indexes, table, out_dtype=np.int16)


def test_golden_stream_pinned():
    """Pin the exact stream bytes for a fixed input.

    The encoder was rewritten from two-pass to single-pass in round 4 with
    a bit-identical-stream guarantee; this digest freezes the on-disk
    format so any future encoder change that silently alters the byte
    layout (and would orphan saved .mmnc containers) fails loudly."""
    import hashlib

    rng = np.random.default_rng(1234)
    cdfs, lengths = [], []
    for n in (6, 18, 40):
        pmf = rng.random(n) + 1e-4
        pmf = pmf / pmf.sum() * (1 - 1e-6)
        cdf = pmf_to_quantized_cdf_np(np.concatenate([pmf, [1e-6]]))
        cdfs.append(cdf)
        lengths.append(len(cdf))
    m = max(lengths)
    mat = np.zeros((3, m), np.int32)
    for r, c in enumerate(cdfs):
        mat[r, :len(c)] = c
    table = CdfTable(cdfs=mat, cdf_lengths=np.asarray(lengths, np.int32),
                     offsets=np.asarray([-3, 0, 5], np.int32))
    n = 10_000
    idx = rng.integers(0, 3, n).astype(np.int32)
    sym = rng.integers(-10, 50, n).astype(np.int32)
    out_pos = np.arange(0, n, 97)  # deterministic multi-chunk bypass outliers
    sym[out_pos] = (np.arange(len(out_pos)) * 7919) % 60001 - 30000

    data = rans.encode_with_indexes(sym, idx, table)
    assert np.array_equal(rans.decode_with_indexes(data, idx, table), sym)
    assert len(data) == 23184
    assert (hashlib.sha256(data).hexdigest()
            == "6b97949d2e92d3c8862866115a8f02c6e60f463b69bfe726105bd99ce8d4d925")


def test_fast_path_matches_classic_streams_and_symbols(monkeypatch):
    """The LUT decode + reciprocal encode must be byte- and symbol-identical
    to the classic binary-search/division path on every dtype combo,
    including bypass escapes (out-of-range symbols)."""
    rng = np.random.default_rng(7)
    for trial in range(8):
        table = _random_table(rng, rows=rng.integers(2, 9))
        n = int(rng.integers(1000, 5000))
        rows = len(table.cdf_lengths)
        indexes = rng.integers(0, rows, n).astype(np.int32)
        # mix of in-range symbols and far outliers that force bypass
        max_vals = table.max_values[indexes]
        sym = rng.integers(0, np.maximum(max_vals, 1))
        esc = rng.random(n) < 0.05
        sym = np.where(esc, rng.integers(-3000, 3000, n), sym)
        sym = (sym + table.offsets[indexes]).astype(np.int32)

        for sdt, idt in ((np.int32, np.int32), (np.int16, np.uint8),
                         (np.int16, np.int32)):
            if sdt == np.int16 and np.abs(sym).max() >= 2 ** 15:
                continue
            s, i = sym.astype(sdt), indexes.astype(idt)
            monkeypatch.setenv("MMNC_RANS_FAST", "0")
            classic = rans.encode_with_indexes(s, i, table)
            dec_classic = rans.decode_with_indexes(classic, i, table)
            monkeypatch.setenv("MMNC_RANS_FAST", "1")
            fast = rans.encode_with_indexes(s, i, table)
            dec_fast = rans.decode_with_indexes(fast, i, table)
            assert fast == classic, (trial, sdt, idt)
            np.testing.assert_array_equal(dec_fast, sym)
            np.testing.assert_array_equal(dec_classic, sym)
            # cross: classic stream through the fast decoder (same bytes,
            # but keeps the pairing honest if the formats ever diverge)
            np.testing.assert_array_equal(
                rans.decode_with_indexes(classic, i, table), sym)
