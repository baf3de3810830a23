// Native host-side ingestion batcher.
//
// The reference's witness pipeline does its host-side work (SHA-style message
// padding, big-endian word packing) in single-threaded JavaScript per passport
// (test/process_passport.js:11-91 `padding`); its only native code is the
// circom-generated C++ witness generator. Here the device side is XLA; the
// host side batches ingestion natively: pad B variable-length blobs and emit
// the (n_words, B) uint32 big-endian word tensor the SHA kernels consume, in
// one pass, batch minor-most (the framework's device layout), multithreaded
// over the batch.
//
// C ABI only (loaded via ctypes from ingest/native.py).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline uint32_t load_be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

inline void store_be64(uint8_t* p, uint64_t v) {
  for (int i = 7; i >= 0; --i) {
    p[i] = uint8_t(v & 0xff);
    v >>= 8;
  }
}

// Pad one blob (MD-style: 0x80, zeros, 64/128-bit big-endian bit length) into
// `buf` (total_bytes, pre-zeroed region is written fully) and scatter its
// big-endian 32-bit words into out[w * batch + b].
// Returns false if the blob cannot pad to exactly n_blocks blocks.
bool pad_one(const uint8_t* src, int64_t len, int64_t block_bytes,
             int64_t total_bytes, int64_t lenfield, uint8_t* buf,
             uint32_t* out, int64_t batch, int64_t b) {
  const int64_t min_padded = len + 1 + lenfield;
  if (min_padded > total_bytes || min_padded <= total_bytes - block_bytes)
    return false;
  std::memcpy(buf, src, size_t(len));
  std::memset(buf + len, 0, size_t(total_bytes - len));
  buf[len] = 0x80;
  // bit length: the final 8 bytes (the leading 8 of a 128-bit field are
  // always zero for realistic lengths)
  store_be64(buf + total_bytes - 8, uint64_t(len) * 8);
  const int64_t n_words = total_bytes / 4;
  for (int64_t w = 0; w < n_words; ++w)
    out[w * batch + b] = load_be32(buf + 4 * w);
  return true;
}

}  // namespace

extern "C" {

// blobs: batch rows of `stride` bytes (row b holds lens[b] valid bytes).
// out:   (total_bytes/4, batch) uint32, row-major (batch minor-most).
// Returns 0 on success, or 1-based index of the first bad blob.
int64_t pzk_pad_words32(const uint8_t* blobs, const int64_t* lens,
                        int64_t batch, int64_t stride, int64_t block_bits,
                        int64_t n_blocks, uint32_t* out) {
  if (block_bits != 512 && block_bits != 1024) return -1;
  const int64_t block_bytes = block_bits / 8;
  const int64_t total_bytes = block_bytes * n_blocks;
  const int64_t lenfield = (block_bits == 512) ? 8 : 16;

  const int hw = int(std::thread::hardware_concurrency());
  const int n_threads =
      (batch >= 1024 && hw > 1) ? (batch / 512 < hw ? int(batch / 512) : hw)
                                : 1;
  std::vector<int64_t> bad(size_t(n_threads), 0);

  auto work = [&](int t) {
    std::vector<uint8_t> buf(static_cast<size_t>(total_bytes), 0);
    const int64_t lo = batch * t / n_threads;
    const int64_t hi = batch * (t + 1) / n_threads;
    for (int64_t b = lo; b < hi; ++b) {
      if (!pad_one(blobs + b * stride, lens[b], block_bytes, total_bytes,
                   lenfield, buf.data(), out, batch, b)) {
        bad[size_t(t)] = b + 1;
        return;
      }
    }
  };

  if (n_threads == 1) {
    work(0);
  } else {
    std::vector<std::thread> ts;
    ts.reserve(size_t(n_threads));
    for (int t = 0; t < n_threads; ++t) ts.emplace_back(work, t);
    for (auto& th : ts) th.join();
  }
  for (int64_t v : bad)
    if (v) return v;
  return 0;
}

// Big-endian byte strings -> (k, batch) uint32 little-endian 2^16-limb
// tensor (the framework's bignum layout; analog of
// test/process_passport.js:113-135 bigintToArray).
// rows of `stride` bytes, lens[b] valid (value right-aligned big-endian).
int64_t pzk_bytes_to_limbs16(const uint8_t* blobs, const int64_t* lens,
                             int64_t batch, int64_t stride, int64_t k,
                             uint32_t* out) {
  for (int64_t b = 0; b < batch; ++b) {
    const int64_t len = lens[b];
    if (2 * k < len) return b + 1;
    const uint8_t* src = blobs + b * stride;
    for (int64_t limb = 0; limb < k; ++limb) {
      // limb i covers bytes [len-2i-2, len-2i-1] of the big-endian string
      const int64_t hi_idx = len - 2 * limb - 2;
      const int64_t lo_idx = len - 2 * limb - 1;
      uint32_t v = 0;
      if (lo_idx >= 0) v = src[lo_idx];
      if (hi_idx >= 0) v |= uint32_t(src[hi_idx]) << 8;
      out[limb * batch + b] = v;
    }
  }
  return 0;
}

}  // extern "C"
