// TPU-framework host-side rANS range coder + pmf->CDF quantizer.
//
// From-scratch C++ implementation of the capability of the reference
// dependency's native layer (SURVEY.md X4/X5): compressai's
// RansEncoder/RansDecoder (cpp_exts/rans/rans_interface.cpp, 64-bit rANS with
// 16-bit quantized CDFs and a raw-bit bypass mode for out-of-range symbols)
// and compressai._CXX.pmf_to_quantized_cdf (cpp_exts/ops/ops.cpp).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
// The device side produces int32 symbols + per-symbol CDF-row indexes; this
// layer is pure host CPU and runs concurrently with TPU compute.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <limits>
#include <vector>
#include <algorithm>

namespace {

constexpr uint32_t kPrecision = 16;
constexpr uint64_t kRansL = 1ull << 31;  // lower bound of the state interval
constexpr uint32_t kBypassPrecision = 4; // raw-bit chunk size
constexpr uint32_t kMaxBypassVal = (1u << kBypassPrecision) - 1;

inline void enc_renorm(uint64_t &x, std::vector<uint32_t> &out, uint64_t x_max) {
  while (x >= x_max) {
    out.push_back(static_cast<uint32_t>(x));
    x >>= 32;
  }
}

inline void enc_put(uint64_t &x, std::vector<uint32_t> &out, uint32_t start,
                    uint32_t freq) {
  const uint64_t x_max = ((kRansL >> kPrecision) << 32) * freq;
  enc_renorm(x, out, x_max);
  x = ((x / freq) << kPrecision) + (x % freq) + start;
}

inline void enc_put_bits(uint64_t &x, std::vector<uint32_t> &out, uint32_t val,
                         uint32_t nbits) {
  const uint64_t x_max = (kRansL >> nbits) << 32;
  enc_renorm(x, out, x_max);
  x = (x << nbits) | val;
}

struct Reader {
  const uint32_t *ptr;
  const uint32_t *end;
  uint64_t x;
  bool ok = true;

  Reader(const uint8_t *data, int64_t nbytes) {
    ptr = reinterpret_cast<const uint32_t *>(data);
    end = ptr + nbytes / 4;
    if (end - ptr >= 2) {
      uint64_t lo = *ptr++;
      uint64_t hi = *ptr++;
      x = (hi << 32) | lo;
    } else {
      x = kRansL;
      ok = false;
    }
  }

  inline void renorm() {
    while (x < kRansL) {
      if (ptr >= end) { ok = false; return; }
      x = (x << 32) | *ptr++;
    }
  }

  inline uint32_t get_cum() const {
    return static_cast<uint32_t>(x & ((1u << kPrecision) - 1));
  }

  inline void advance(uint32_t start, uint32_t freq) {
    x = freq * (x >> kPrecision) + get_cum() - start;
    renorm();
  }

  inline uint32_t get_bits(uint32_t nbits) {
    uint32_t val = static_cast<uint32_t>(x & ((1ull << nbits) - 1));
    x >>= nbits;
    renorm();
    return val;
  }
};

// Binary search for the symbol whose [cdf[s], cdf[s+1]) contains cum.
inline int32_t find_symbol(const int32_t *cdf, int32_t cdf_len, uint32_t cum) {
  int32_t lo = 0, hi = cdf_len - 1;  // symbols are 0 .. cdf_len-2
  while (hi - lo > 1) {
    int32_t mid = (lo + hi) >> 1;
    if (static_cast<uint32_t>(cdf[mid]) <= cum) lo = mid;
    else hi = mid;
  }
  return lo;
}

// Typed cores: the coder is agnostic to how symbols/indexes arrive in host
// memory. The tunneled-TPU pipeline D2H's symbols as int16 and CDF-row
// indexes as uint8 (64-row Gaussian table) to halve/quarter transfer bytes
// on the slow link; the classic API keeps int32 everywhere. Both lower to
// the same stream bytes — layouts are bit-identical across type choices.
template <typename SymT, typename IdxT>
int64_t encode_impl(const SymT *symbols, const IdxT *indexes, int64_t n,
                    const int32_t *cdfs, int64_t cdf_stride,
                    const int32_t *cdf_lengths, const int32_t *offsets,
                    uint8_t *out, int64_t out_capacity) {
  // Single reverse pass: rANS encodes in stream-reverse order, so walk the
  // symbols backward and, inside each symbol's bypass group, replay its
  // forward emission order [value, count-unary..., chunks...] reversed.
  // No intermediate RansSym vector — the working set stays L1/L2-sized
  // regardless of n (the two-pass variant built a 12·n-byte vector and then
  // walked it backward, which thrashed the cache on large batches).
  uint64_t x = kRansL;
  std::vector<uint32_t> words;
  words.reserve(static_cast<size_t>(n) / 2 + 4);

  for (int64_t i = n - 1; i >= 0; --i) {
    const int32_t idx = static_cast<int32_t>(indexes[i]);
    const int32_t *cdf = cdfs + idx * cdf_stride;
    const int32_t max_value = cdf_lengths[idx] - 2;
    int32_t value = static_cast<int32_t>(symbols[i]) - offsets[idx];

    uint32_t raw_val = 0;
    if (value < 0) {
      raw_val = static_cast<uint32_t>(-2 * value - 1);
      value = max_value;
    } else if (value >= max_value) {
      raw_val = static_cast<uint32_t>(2 * (value - max_value));
      value = max_value;
    }

    if (value == max_value) {
      uint32_t n_bypass = 0;
      while ((raw_val >> (n_bypass * kBypassPrecision)) != 0) ++n_bypass;
      // chunks were emitted forward j=0..n_bypass-1 -> encode j reversed
      for (uint32_t j = n_bypass; j-- > 0;) {
        uint32_t chunk = (raw_val >> (j * kBypassPrecision)) & kMaxBypassVal;
        enc_put_bits(x, words, chunk, kBypassPrecision);
      }
      // count unary was emitted as kMaxBypassVal x k then the remainder ->
      // encode remainder first, then the k full chunks
      uint32_t k = n_bypass / kMaxBypassVal;
      enc_put_bits(x, words, n_bypass - k * kMaxBypassVal, kBypassPrecision);
      for (uint32_t j = 0; j < k; ++j)
        enc_put_bits(x, words, kMaxBypassVal, kBypassPrecision);
    }

    enc_put(x, words, static_cast<uint32_t>(cdf[value]),
            static_cast<uint32_t>(cdf[value + 1] - cdf[value]));
  }
  // flush 64-bit state; pushed high-then-low so that after the reversal
  // below the decoder reads (low, high) as its first two words
  words.push_back(static_cast<uint32_t>(x >> 32));
  words.push_back(static_cast<uint32_t>(x));

  const int64_t nbytes = static_cast<int64_t>(words.size()) * 4;
  if (nbytes > out_capacity) return -1;
  // words were emitted in decode-reverse order; write them reversed so the
  // decoder streams forward: state words first, then renorm words in order.
  uint32_t *out32 = reinterpret_cast<uint32_t *>(out);
  for (size_t i = 0; i < words.size(); ++i) {
    out32[i] = words[words.size() - 1 - i];
  }
  return nbytes;
}

template <typename IdxT, typename OutT>
int32_t decode_impl(const uint8_t *data, int64_t nbytes, const IdxT *indexes,
                    int64_t n, const int32_t *cdfs, int64_t cdf_stride,
                    const int32_t *cdf_lengths, const int32_t *offsets,
                    OutT *out_symbols) {
  Reader r(data, nbytes);
  if (!r.ok) return -1;

  for (int64_t i = 0; i < n; ++i) {
    const int32_t idx = static_cast<int32_t>(indexes[i]);
    const int32_t *cdf = cdfs + idx * cdf_stride;
    const int32_t cdf_len = cdf_lengths[idx];
    const int32_t max_value = cdf_len - 2;

    const uint32_t cum = r.get_cum();
    int32_t value = find_symbol(cdf, cdf_len, cum);
    r.advance(static_cast<uint32_t>(cdf[value]),
              static_cast<uint32_t>(cdf[value + 1] - cdf[value]));

    if (value == max_value) {
      // bypass: read chunk count, then the raw value
      uint32_t val = r.get_bits(kBypassPrecision);
      uint32_t n_bypass = val;
      while (val == kMaxBypassVal) {
        val = r.get_bits(kBypassPrecision);
        n_bypass += val;
      }
      uint32_t raw_val = 0;
      for (uint32_t j = 0; j < n_bypass; ++j) {
        raw_val |= r.get_bits(kBypassPrecision) << (j * kBypassPrecision);
      }
      value = static_cast<int32_t>(raw_val >> 1);
      if (raw_val & 1) value = -value - 1;
      else value += max_value;
    }
    if (!r.ok && i + 1 < n) return -2;
    const int32_t sym = value + offsets[idx];
    if (sizeof(OutT) < sizeof(int32_t) &&
        (sym < std::numeric_limits<OutT>::min() ||
         sym > std::numeric_limits<OutT>::max()))
      return -3;  // stream holds an outlier the narrow output can't represent
    out_symbols[i] = static_cast<OutT>(sym);
  }
  return 0;
}

// ---- fast paths -----------------------------------------------------------
// Same stream bytes, same math — only the per-symbol cost changes:
// * decode: a per-row bucket table (cum >> 8 -> bracketing value range,
//   256 uint16 entries per row = 512 B, cache-resident even across many
//   rows) narrows the binary search to the handful of symbols inside one
//   bucket — usually zero or one halving step. A full 2^16 cum->value LUT
//   was measured FIRST and rejected: at 128 KB/row it falls out of L2 and
//   decodes ~35% slower than the plain binary search on realistic stats.
// * encode: the 64-bit division/modulo by freq becomes a precomputed
//   reciprocal multiply (Granlund-Montgomery round-up method — exact for
//   all x < 2^63, and the encoder state is < 2^47 * freq <= 2^63 after
//   renorm), with start/freq/x_max resolved through one table entry.
// Both acceleration tables are built once per CdfTable on the Python side
// and passed in by pointer; the classic entry points stay for callers
// without prebuilt tables.

constexpr uint32_t kBucketBits = 8;  // buckets of 2^(16-8) cum values

template <typename IdxT, typename OutT>
int32_t decode_fast_impl(const uint8_t *data, int64_t nbytes,
                         const IdxT *indexes, int64_t n, const int32_t *cdfs,
                         int64_t cdf_stride, const int32_t *cdf_lengths,
                         const int32_t *offsets, const uint16_t *buckets,
                         OutT *out_symbols) {
  constexpr uint32_t kNBuckets = 1u << (kPrecision - kBucketBits);
  Reader r(data, nbytes);
  if (!r.ok) return -1;

  for (int64_t i = 0; i < n; ++i) {
    const int32_t idx = static_cast<int32_t>(indexes[i]);
    const int32_t *cdf = cdfs + idx * cdf_stride;
    const int32_t cdf_len = cdf_lengths[idx];
    const int32_t max_value = cdf_len - 2;

    const uint32_t cum = r.get_cum();
    const uint16_t *brow = buckets + static_cast<int64_t>(idx) * kNBuckets;
    const uint32_t b = cum >> kBucketBits;
    // bracket: cdf[lo] <= cum (bucket start's symbol), cdf[hi] > cum
    // (the next bucket start's symbol upper-bounds every cum in b)
    int32_t lo = brow[b];
    int32_t hi = (b + 1 < kNBuckets)
                     ? static_cast<int32_t>(brow[b + 1]) + 1
                     : cdf_len - 1;
    while (hi - lo > 1) {
      int32_t mid = (lo + hi) >> 1;
      if (static_cast<uint32_t>(cdf[mid]) <= cum) lo = mid;
      else hi = mid;
    }
    int32_t value = lo;
    r.advance(static_cast<uint32_t>(cdf[value]),
              static_cast<uint32_t>(cdf[value + 1] - cdf[value]));

    if (value == max_value) {
      uint32_t val = r.get_bits(kBypassPrecision);
      uint32_t n_bypass = val;
      while (val == kMaxBypassVal) {
        val = r.get_bits(kBypassPrecision);
        n_bypass += val;
      }
      uint32_t raw_val = 0;
      for (uint32_t j = 0; j < n_bypass; ++j) {
        raw_val |= r.get_bits(kBypassPrecision) << (j * kBypassPrecision);
      }
      value = static_cast<int32_t>(raw_val >> 1);
      if (raw_val & 1) value = -value - 1;
      else value += max_value;
    }
    if (!r.ok && i + 1 < n) return -2;
    const int32_t sym = value + offsets[idx];
    if (sizeof(OutT) < sizeof(int32_t) &&
        (sym < std::numeric_limits<OutT>::min() ||
         sym > std::numeric_limits<OutT>::max()))
      return -3;
    out_symbols[i] = static_cast<OutT>(sym);
  }
  return 0;
}

}  // namespace

extern "C" {

// Build the per-row decode bucket table: buckets[r * 256 + b] = the value
// v whose [cdf[v], cdf[v+1]) contains cum = b << 8 (the bucket's first cum).
// Caller provides rows * 256 uint16s.
int32_t mmnc_rans_decbuckets_build(const int32_t *cdfs, int64_t cdf_stride,
                                   const int32_t *cdf_lengths, int32_t rows,
                                   uint16_t *buckets) {
  constexpr uint32_t kNBuckets = 1u << (kPrecision - kBucketBits);
  for (int32_t r = 0; r < rows; ++r) {
    const int32_t *cdf = cdfs + r * cdf_stride;
    const int32_t len = cdf_lengths[r];
    if (len < 2 || cdf[0] != 0 || cdf[len - 1] != (1 << kPrecision))
      return -1;
    uint16_t *row = buckets + static_cast<int64_t>(r) * kNBuckets;
    int32_t v = 0;
    for (uint32_t b = 0; b < kNBuckets; ++b) {
      const int32_t cum = static_cast<int32_t>(b << kBucketBits);
      while (v + 2 < len && cdf[v + 1] <= cum) ++v;
      row[b] = static_cast<uint16_t>(v);
    }
  }
  return 0;
}

int32_t mmnc_rans_decode_fast_u8i16(
    const uint8_t *data, int64_t nbytes, const uint8_t *indexes, int64_t n,
    const int32_t *cdfs, int64_t cdf_stride, const int32_t *cdf_lengths,
    const int32_t *offsets, const uint16_t *lut, int16_t *out_symbols) {
  return decode_fast_impl(data, nbytes, indexes, n, cdfs, cdf_stride,
                          cdf_lengths, offsets, lut, out_symbols);
}

int32_t mmnc_rans_decode_fast_i32i16(
    const uint8_t *data, int64_t nbytes, const int32_t *indexes, int64_t n,
    const int32_t *cdfs, int64_t cdf_stride, const int32_t *cdf_lengths,
    const int32_t *offsets, const uint16_t *lut, int16_t *out_symbols) {
  return decode_fast_impl(data, nbytes, indexes, n, cdfs, cdf_stride,
                          cdf_lengths, offsets, lut, out_symbols);
}

int32_t mmnc_rans_decode_fast_i32i32(
    const uint8_t *data, int64_t nbytes, const int32_t *indexes, int64_t n,
    const int32_t *cdfs, int64_t cdf_stride, const int32_t *cdf_lengths,
    const int32_t *offsets, const uint16_t *lut, int32_t *out_symbols) {
  return decode_fast_impl(data, nbytes, indexes, n, cdfs, cdf_stride,
                          cdf_lengths, offsets, lut, out_symbols);
}

// Quantize a float pmf (with the tail mass as its last entry) into an
// integer CDF with cdf[0]=0, cdf[n]=2^precision and every frequency >= 1
// (stealing a count from the lowest-frequency symbol with freq > 1).
// Writes n+1 entries into cdf_out. Returns 0 on success.
int32_t mmnc_pmf_to_quantized_cdf(const float *pmf, int32_t n,
                                  int32_t precision, int32_t *cdf_out) {
  if (n <= 0 || precision <= 0 || precision > 24) return -1;
  std::vector<uint64_t> freq(n);
  uint64_t total = 0;
  for (int32_t i = 0; i < n; ++i) {
    float p = pmf[i];
    if (!(p >= 0.f) || !std::isfinite(p)) return -2;
    freq[i] = static_cast<uint64_t>(std::llround(
        static_cast<double>(p) * (1u << precision)));
    total += freq[i];
  }
  if (total == 0) return -3;

  const uint64_t scale = 1u << precision;
  cdf_out[0] = 0;
  uint64_t acc = 0;
  for (int32_t i = 0; i < n; ++i) {
    acc += (freq[i] * scale) / total;
    cdf_out[i + 1] = static_cast<int32_t>(acc);
  }
  cdf_out[n] = static_cast<int32_t>(scale);

  for (int32_t i = 0; i < n; ++i) {
    if (cdf_out[i] != cdf_out[i + 1]) continue;
    // steal one count from the lowest-frequency symbol with freq > 1
    int32_t best = -1;
    int32_t best_freq = INT32_MAX;
    for (int32_t j = 0; j < n; ++j) {
      int32_t f = cdf_out[j + 1] - cdf_out[j];
      if (f > 1 && f < best_freq) { best_freq = f; best = j; }
    }
    if (best < 0) return -4;
    if (best < i) {
      for (int32_t j = best + 1; j <= i; ++j) cdf_out[j] -= 1;
    } else {
      for (int32_t j = i + 1; j <= best; ++j) cdf_out[j] += 1;
    }
  }
  return 0;
}

// Encode n symbols. cdfs is a (rows, cdf_stride) row-major int32 matrix;
// row r has cdf_lengths[r] valid entries; the largest in-range symbol of
// row r is cdf_lengths[r]-2 and doubles as the escape for bypass coding.
// Returns the number of bytes written to `out` (multiple of 4), or a
// negative error code (-1 capacity exceeded).
int64_t mmnc_rans_encode_with_indexes(
    const int32_t *symbols, const int32_t *indexes, int64_t n,
    const int32_t *cdfs, int64_t cdf_stride, const int32_t *cdf_lengths,
    const int32_t *offsets, uint8_t *out, int64_t out_capacity) {
  return encode_impl(symbols, indexes, n, cdfs, cdf_stride, cdf_lengths,
                     offsets, out, out_capacity);
}

// int16 symbols (as D2H'd from the device) + uint8 CDF-row indexes
// (Gaussian scale table has 64 rows). Stream bytes identical to the i32 API.
int64_t mmnc_rans_encode_i16u8(
    const int16_t *symbols, const uint8_t *indexes, int64_t n,
    const int32_t *cdfs, int64_t cdf_stride, const int32_t *cdf_lengths,
    const int32_t *offsets, uint8_t *out, int64_t out_capacity) {
  return encode_impl(symbols, indexes, n, cdfs, cdf_stride, cdf_lengths,
                     offsets, out, out_capacity);
}

// int16 symbols + int32 indexes (hyper-latent z: host-built channel indexes
// may exceed 255 channels, symbols still narrow).
int64_t mmnc_rans_encode_i16i32(
    const int16_t *symbols, const int32_t *indexes, int64_t n,
    const int32_t *cdfs, int64_t cdf_stride, const int32_t *cdf_lengths,
    const int32_t *offsets, uint8_t *out, int64_t out_capacity) {
  return encode_impl(symbols, indexes, n, cdfs, cdf_stride, cdf_lengths,
                     offsets, out, out_capacity);
}

// Decode n symbols given their per-symbol CDF-row indexes.
// Returns 0 on success, negative on stream corruption.
int32_t mmnc_rans_decode_with_indexes(
    const uint8_t *data, int64_t nbytes, const int32_t *indexes, int64_t n,
    const int32_t *cdfs, int64_t cdf_stride, const int32_t *cdf_lengths,
    const int32_t *offsets, int32_t *out_symbols) {
  return decode_impl(data, nbytes, indexes, n, cdfs, cdf_stride, cdf_lengths,
                     offsets, out_symbols);
}

// uint8 indexes -> int16 symbols (H2D-lean decode; returns -3 if the stream
// holds an outlier that doesn't fit int16).
int32_t mmnc_rans_decode_u8i16(
    const uint8_t *data, int64_t nbytes, const uint8_t *indexes, int64_t n,
    const int32_t *cdfs, int64_t cdf_stride, const int32_t *cdf_lengths,
    const int32_t *offsets, int16_t *out_symbols) {
  return decode_impl(data, nbytes, indexes, n, cdfs, cdf_stride, cdf_lengths,
                     offsets, out_symbols);
}

// int32 indexes -> int16 symbols (z path).
int32_t mmnc_rans_decode_i32i16(
    const uint8_t *data, int64_t nbytes, const int32_t *indexes, int64_t n,
    const int32_t *cdfs, int64_t cdf_stride, const int32_t *cdf_lengths,
    const int32_t *offsets, int16_t *out_symbols) {
  return decode_impl(data, nbytes, indexes, n, cdfs, cdf_stride, cdf_lengths,
                     offsets, out_symbols);
}

}  // extern "C"
