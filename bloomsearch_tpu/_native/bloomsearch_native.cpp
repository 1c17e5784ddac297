// Native host-side runtime kernels for bloomsearch-tpu.
//
// The reference engine's performance-critical inner loops live in Go
// libraries (murmur3 hashing, bitset ops, CRC32C — SURVEY.md §2 "Native
// components"). Here they are C++ with batch interfaces so Python never
// loops per key: batched murmur3 x64_128 string hashing, scatter-OR bloom
// construction, AND-reduce probing, and CRC32C (Castagnoli, slicing-by-8).
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>

#if defined(__GNUC__)
#define BS_EXPORT extern "C" __attribute__((visibility("default")))
#else
#define BS_EXPORT extern "C"
#endif

// ---------------------------------------------------------------------------
// murmur3 x64_128 (public domain algorithm), seed 0, little-endian blocks.
// Semantics must match bloomsearch_tpu/bloom/hashing.py::murmur3_x64_128,
// which the tests cross-check.
// ---------------------------------------------------------------------------

static inline uint64_t rotl64(uint64_t x, int8_t r) {
  return (x << r) | (x >> (64 - r));
}

static inline uint64_t fmix64(uint64_t h) {
  h ^= h >> 33;
  h *= 0xff51afd7ed558ccdULL;
  h ^= h >> 33;
  h *= 0xc4ceb9fe1a85ec53ULL;
  h ^= h >> 33;
  return h;
}

static void murmur3_x64_128(const uint8_t* data, uint64_t len, uint64_t seed,
                            uint64_t* out) {
  const uint64_t nblocks = len / 16;
  uint64_t h1 = seed;
  uint64_t h2 = seed;
  const uint64_t c1 = 0x87c37b91114253d5ULL;
  const uint64_t c2 = 0x4cf5ad432745937fULL;

  for (uint64_t i = 0; i < nblocks; i++) {
    uint64_t k1, k2;
    std::memcpy(&k1, data + i * 16, 8);
    std::memcpy(&k2, data + i * 16 + 8, 8);

    k1 *= c1;
    k1 = rotl64(k1, 31);
    k1 *= c2;
    h1 ^= k1;
    h1 = rotl64(h1, 27);
    h1 += h2;
    h1 = h1 * 5 + 0x52dce729;

    k2 *= c2;
    k2 = rotl64(k2, 33);
    k2 *= c1;
    h2 ^= k2;
    h2 = rotl64(h2, 31);
    h2 += h1;
    h2 = h2 * 5 + 0x38495ab5;
  }

  const uint8_t* tail = data + nblocks * 16;
  const uint64_t tail_len = len & 15;
  uint64_t k1 = 0;
  uint64_t k2 = 0;
  switch (tail_len) {
    case 15: k2 ^= ((uint64_t)tail[14]) << 48; [[fallthrough]];
    case 14: k2 ^= ((uint64_t)tail[13]) << 40; [[fallthrough]];
    case 13: k2 ^= ((uint64_t)tail[12]) << 32; [[fallthrough]];
    case 12: k2 ^= ((uint64_t)tail[11]) << 24; [[fallthrough]];
    case 11: k2 ^= ((uint64_t)tail[10]) << 16; [[fallthrough]];
    case 10: k2 ^= ((uint64_t)tail[9]) << 8; [[fallthrough]];
    case 9:
      k2 ^= ((uint64_t)tail[8]) << 0;
      k2 *= c2;
      k2 = rotl64(k2, 33);
      k2 *= c1;
      h2 ^= k2;
      [[fallthrough]];
    case 8: k1 ^= ((uint64_t)tail[7]) << 56; [[fallthrough]];
    case 7: k1 ^= ((uint64_t)tail[6]) << 48; [[fallthrough]];
    case 6: k1 ^= ((uint64_t)tail[5]) << 40; [[fallthrough]];
    case 5: k1 ^= ((uint64_t)tail[4]) << 32; [[fallthrough]];
    case 4: k1 ^= ((uint64_t)tail[3]) << 24; [[fallthrough]];
    case 3: k1 ^= ((uint64_t)tail[2]) << 16; [[fallthrough]];
    case 2: k1 ^= ((uint64_t)tail[1]) << 8; [[fallthrough]];
    case 1:
      k1 ^= ((uint64_t)tail[0]) << 0;
      k1 *= c1;
      k1 = rotl64(k1, 31);
      k1 *= c2;
      h1 ^= k1;
  }

  h1 ^= len;
  h2 ^= len;
  h1 += h2;
  h2 += h1;
  h1 = fmix64(h1);
  h2 = fmix64(h2);
  h1 += h2;
  h2 += h1;
  out[0] = h1;
  out[1] = h2;
}

// Batch hash: key i spans data[offsets[i], offsets[i+1]). offsets has n+1
// entries. out is [n, 2] uint64 (h1, h2) rows.
BS_EXPORT void bs_hash_batch(const uint8_t* data, const int64_t* offsets,
                             int64_t n, uint64_t* out) {
  for (int64_t i = 0; i < n; i++) {
    const int64_t start = offsets[i];
    const int64_t len = offsets[i + 1] - start;
    murmur3_x64_128(data + start, (uint64_t)len, 0, out + 2 * i);
  }
}

// ---------------------------------------------------------------------------
// Bloom construction / probing over uint32 word arrays.
// Positions are absolute bit indices in [0, m_bits); layout word = pos >> 5,
// bit = pos & 31, matching hashing.py::split_positions.
// ---------------------------------------------------------------------------

// OR the given bit positions into words (scatter-OR build).
BS_EXPORT void bs_scatter_or(uint32_t* words, const uint64_t* positions,
                             int64_t n_positions) {
  for (int64_t i = 0; i < n_positions; i++) {
    const uint64_t pos = positions[i];
    words[pos >> 5] |= (uint32_t)1 << (pos & 31);
  }
}

// KM positions + scatter-OR fused: hashes is [n,2] uint64.
BS_EXPORT void bs_build_from_hashes(uint32_t* words, uint64_t m_bits, int64_t k,
                                    const uint64_t* hashes, int64_t n) {
  for (int64_t i = 0; i < n; i++) {
    const uint64_t h1 = hashes[2 * i];
    const uint64_t h2 = hashes[2 * i + 1];
    uint64_t pos = h1;
    for (int64_t j = 0; j < k; j++) {
      const uint64_t p = pos % m_bits;
      words[p >> 5] |= (uint32_t)1 << (p & 31);
      pos += h2;
    }
  }
}

// AND-reduce probe: out[i] = 1 iff all k bits for key i are set.
BS_EXPORT void bs_probe_from_hashes(const uint32_t* words, uint64_t m_bits,
                                    int64_t k, const uint64_t* hashes,
                                    int64_t n, uint8_t* out) {
  for (int64_t i = 0; i < n; i++) {
    const uint64_t h1 = hashes[2 * i];
    const uint64_t h2 = hashes[2 * i + 1];
    uint64_t pos = h1;
    uint8_t hit = 1;
    for (int64_t j = 0; j < k; j++) {
      const uint64_t p = pos % m_bits;
      if (!((words[p >> 5] >> (p & 31)) & 1)) {
        hit = 0;
        break;
      }
      pos += h2;
    }
    out[i] = hit;
  }
}

// ---------------------------------------------------------------------------
// CRC32C (Castagnoli polynomial 0x1EDC6F41, reflected 0x82F63B78),
// slicing-by-8. Matches Go's hash/crc32 Castagnoli table semantics
// (reference file_format.go:33-34).
// ---------------------------------------------------------------------------

static uint32_t kCrcTables[8][256];
static bool kCrcInit = false;

static void crc32c_init() {
  if (kCrcInit) return;
  const uint32_t poly = 0x82F63B78u;
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t crc = i;
    for (int j = 0; j < 8; j++) {
      crc = (crc >> 1) ^ ((crc & 1) ? poly : 0);
    }
    kCrcTables[0][i] = crc;
  }
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t crc = kCrcTables[0][i];
    for (int t = 1; t < 8; t++) {
      crc = (crc >> 8) ^ kCrcTables[0][crc & 0xff];
      kCrcTables[t][i] = crc;
    }
  }
  kCrcInit = true;
}

BS_EXPORT uint32_t bs_crc32c(const uint8_t* data, int64_t n, uint32_t crc_in) {
  crc32c_init();
  uint32_t crc = ~crc_in;
  int64_t i = 0;
  // Process 8 bytes at a time.
  while (n - i >= 8) {
    uint64_t chunk;
    std::memcpy(&chunk, data + i, 8);
    crc ^= (uint32_t)chunk;
    const uint32_t hi = (uint32_t)(chunk >> 32);
    crc = kCrcTables[7][crc & 0xff] ^ kCrcTables[6][(crc >> 8) & 0xff] ^
          kCrcTables[5][(crc >> 16) & 0xff] ^ kCrcTables[4][crc >> 24] ^
          kCrcTables[3][hi & 0xff] ^ kCrcTables[2][(hi >> 8) & 0xff] ^
          kCrcTables[1][(hi >> 16) & 0xff] ^ kCrcTables[0][hi >> 24];
    i += 8;
  }
  for (; i < n; i++) {
    crc = (crc >> 8) ^ kCrcTables[0][(crc ^ data[i]) & 0xff];
  }
  return ~crc;
}

// ---------------------------------------------------------------------------
// Length-prefixed row stream helpers.
// Row data sections are streams of (uint32 LE length | row bytes) records
// (reference bloom_tree_engine.go:586-613). Scanning them in Python is a
// per-row loop; this splits a whole decompressed block in one call.
// ---------------------------------------------------------------------------

// Parse offsets of each row payload in a length-prefixed stream.
// out_offsets/out_lengths must have capacity max_rows. Returns the number of
// rows parsed, or -1 on malformed input (record overrunning the buffer).
BS_EXPORT int64_t bs_split_rows(const uint8_t* data, int64_t n,
                                int64_t max_rows, int64_t* out_offsets,
                                int64_t* out_lengths) {
  int64_t pos = 0;
  int64_t count = 0;
  while (pos + 4 <= n && count < max_rows) {
    uint32_t len;
    std::memcpy(&len, data + pos, 4);
    pos += 4;
    if (pos + (int64_t)len > n) return -1;
    out_offsets[count] = pos;
    out_lengths[count] = (int64_t)len;
    pos += (int64_t)len;
    count++;
  }
  if (pos != n && count < max_rows) return -1;  // trailing garbage
  return count;
}

BS_EXPORT int64_t bs_version() { return 1; }
