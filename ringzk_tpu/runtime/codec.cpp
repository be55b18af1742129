// Native wire codec for ringzk_tpu protocol messages.
//
// TPU-native analog of the reference's serde/bincode layer (C8 in SURVEY.md:
// derive-based Serialize/Deserialize with length-prefixed, trailing-zero-
// trimmed coefficient vectors -- see the wire-size regression test at
// /root/reference/src/mat.rs:425-438). Encoding rows of int32 ring
// coefficients is pure CPU byte-twiddling, the one part of the pipeline that
// does not belong on the TPU; Python-side varint loops are ~100x slower, so
// this lives in C++ behind a ctypes FFI (no pybind11 in this image).
//
// Row format (per polynomial of row_len coefficients):
//   u32 LE kept       -- number of coefficients kept (trailing zeros trimmed)
//   kept x varint     -- zigzag-encoded little-endian base-128 varints
//
// Build: scripts/build_native.sh (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Upper bound on encoded size for allocation: 4 bytes header + 5 bytes per
// coefficient, per row.
uint64_t rzk_encode_bound(uint64_t n_rows, uint64_t row_len) {
  return n_rows * (4 + 5 * row_len);
}

// Encode n_rows rows of row_len int32 coeffs. Returns bytes written.
uint64_t rzk_encode_rows(const int32_t* data, uint64_t n_rows,
                         uint64_t row_len, uint8_t* out) {
  uint8_t* p = out;
  for (uint64_t r = 0; r < n_rows; ++r) {
    const int32_t* row = data + r * row_len;
    uint64_t kept = row_len;
    while (kept > 0 && row[kept - 1] == 0) --kept;
    p[0] = (uint8_t)(kept);
    p[1] = (uint8_t)(kept >> 8);
    p[2] = (uint8_t)(kept >> 16);
    p[3] = (uint8_t)(kept >> 24);
    p += 4;
    for (uint64_t i = 0; i < kept; ++i) {
      uint32_t z = ((uint32_t)row[i] << 1) ^ (uint32_t)(row[i] >> 31);  // zigzag
      while (z >= 0x80) {
        *p++ = (uint8_t)(z | 0x80);
        z >>= 7;
      }
      *p++ = (uint8_t)z;
    }
  }
  return (uint64_t)(p - out);
}

// Decode into a pre-zeroed n_rows x row_len int32 buffer.
// Returns bytes consumed, or 0 on malformed input.
uint64_t rzk_decode_rows(const uint8_t* in, uint64_t in_len, int32_t* data,
                         uint64_t n_rows, uint64_t row_len) {
  const uint8_t* p = in;
  const uint8_t* end = in + in_len;
  for (uint64_t r = 0; r < n_rows; ++r) {
    if (end - p < 4) return 0;
    uint32_t kept = (uint32_t)p[0] | ((uint32_t)p[1] << 8) |
                    ((uint32_t)p[2] << 16) | ((uint32_t)p[3] << 24);
    p += 4;
    if (kept > row_len) return 0;
    int32_t* row = data + r * row_len;
    for (uint32_t i = 0; i < kept; ++i) {
      uint32_t z = 0;
      int shift = 0;
      for (;;) {
        if (p >= end || shift > 28) return 0;
        uint8_t b = *p++;
        z |= (uint32_t)(b & 0x7F) << shift;
        if (!(b & 0x80)) break;
        shift += 7;
      }
      row[i] = (int32_t)((z >> 1) ^ (~(z & 1) + 1));  // un-zigzag
    }
  }
  return (uint64_t)(p - in);
}

// Multithreaded encode for large payloads (the multi-host interchange path:
// e.g. 64K proofs' worth of responses). Rows are independent, so each thread
// encodes a contiguous row chunk into its bound-sized slot of `out`; the
// main thread then compacts the slots left with memmove. Byte-identical
// output to rzk_encode_rows. n_threads <= 1 falls through to single-thread.
uint64_t rzk_encode_rows_mt(const int32_t* data, uint64_t n_rows,
                            uint64_t row_len, uint8_t* out,
                            uint32_t n_threads) {
  if (n_threads <= 1 || n_rows < 2 * n_threads) {
    return rzk_encode_rows(data, n_rows, row_len, out);
  }
  uint64_t chunk = (n_rows + n_threads - 1) / n_threads;
  uint64_t slot = chunk * (4 + 5 * row_len);  // per-chunk bound
  std::vector<uint64_t> sizes(n_threads, 0);
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (uint32_t t = 0; t < n_threads; ++t) {
    uint64_t r0 = (uint64_t)t * chunk;
    if (r0 >= n_rows) break;
    uint64_t rows_here = (r0 + chunk <= n_rows) ? chunk : (n_rows - r0);
    threads.emplace_back([=, &sizes]() {
      sizes[t] = rzk_encode_rows(data + r0 * row_len, rows_here, row_len,
                                 out + (uint64_t)t * slot);
    });
  }
  for (auto& th : threads) th.join();
  // compact: slot t's bytes move to the end of slot t-1's bytes
  uint64_t total = sizes[0];
  for (uint32_t t = 1; t < n_threads; ++t) {
    if (sizes[t] == 0) continue;
    std::memmove(out + total, out + (uint64_t)t * slot, sizes[t]);
    total += sizes[t];
  }
  return total;
}

}  // extern "C"
