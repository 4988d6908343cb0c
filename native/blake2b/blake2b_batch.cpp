// Batched BLAKE2b (RFC 7693) for Merkle-tree hashing.
//
// TPU-native-framework runtime component (role of libsodium's
// crypto_generichash_blake2b in the reference, libiop/bcs/hashing/blake2b.cpp):
// the BCS layer hashes 2^20+ equal-length leaf columns and reduces tree
// layers with 2-to-1 compressions — embarrassingly parallel host work, done
// here in C++ with OpenMP instead of a Python hashlib loop.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC -o libblake2b_batch.so
//        blake2b_batch.cpp

#include <cstdint>
#include <cstring>
#include <cstddef>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

constexpr uint64_t IV[8] = {
    0x6a09e667f3bcc908ULL, 0xbb67ae8584caa73bULL, 0x3c6ef372fe94f82bULL,
    0xa54ff53a5f1d36f1ULL, 0x510e527fade682d1ULL, 0x9b05688c2b3e6c1fULL,
    0x1f83d9abfb41bd6bULL, 0x5be0cd19137e2179ULL};

constexpr uint8_t SIGMA[12][16] = {
    {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3},
    {11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4},
    {7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8},
    {9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13},
    {2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9},
    {12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11},
    {13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10},
    {6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5},
    {10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0},
    {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3}};

static inline uint64_t rotr64(uint64_t x, unsigned n) {
  return (x >> n) | (x << (64 - n));
}

static inline uint64_t load64(const uint8_t *p) {
  uint64_t v;
  std::memcpy(&v, p, 8);
  return v;  // little-endian hosts only (x86/ARM/TPU-host)
}

struct B2State {
  uint64_t h[8];
  uint64_t t0;
};

static void compress(B2State &S, const uint8_t block[128], bool last) {
  uint64_t m[16];
  for (int i = 0; i < 16; i++) m[i] = load64(block + 8 * i);
  uint64_t v[16];
  for (int i = 0; i < 8; i++) v[i] = S.h[i];
  for (int i = 0; i < 8; i++) v[8 + i] = IV[i];
  v[12] ^= S.t0;
  if (last) v[14] = ~v[14];

#define G(a, b, c, d, x, y)                                                    \
  v[a] = v[a] + v[b] + (x);                                                    \
  v[d] = rotr64(v[d] ^ v[a], 32);                                              \
  v[c] = v[c] + v[d];                                                          \
  v[b] = rotr64(v[b] ^ v[c], 24);                                              \
  v[a] = v[a] + v[b] + (y);                                                    \
  v[d] = rotr64(v[d] ^ v[a], 16);                                              \
  v[c] = v[c] + v[d];                                                          \
  v[b] = rotr64(v[b] ^ v[c], 63)

  for (int r = 0; r < 12; r++) {
    const uint8_t *s = SIGMA[r];
    G(0, 4, 8, 12, m[s[0]], m[s[1]]);
    G(1, 5, 9, 13, m[s[2]], m[s[3]]);
    G(2, 6, 10, 14, m[s[4]], m[s[5]]);
    G(3, 7, 11, 15, m[s[6]], m[s[7]]);
    G(0, 5, 10, 15, m[s[8]], m[s[9]]);
    G(1, 6, 11, 12, m[s[10]], m[s[11]]);
    G(2, 7, 8, 13, m[s[12]], m[s[13]]);
    G(3, 4, 9, 14, m[s[14]], m[s[15]]);
  }
#undef G
  for (int i = 0; i < 8; i++) S.h[i] ^= v[i] ^ v[8 + i];
}

// tag < 0: hash `in` as-is; tag >= 0: hash (tag_byte || in) — the BCS layer's
// leaf/inner domain separation without materializing prefixed copies.
static void blake2b_one(int tag, const uint8_t *in, size_t in_len,
                        uint8_t *out, size_t digest_len) {
  B2State S;
  for (int i = 0; i < 8; i++) S.h[i] = IV[i];
  S.h[0] ^= 0x01010000ULL ^ (uint64_t)digest_len;  // no key
  S.t0 = 0;

  const size_t pre = (tag >= 0) ? 1 : 0;
  const size_t total = in_len + pre;   // logical message length
  uint8_t block[128];
  size_t done = 0;  // logical bytes consumed so far
  // process all blocks except the last (which may itself be full)
  while (total - done > 128) {
    size_t bo = 0;
    if (done == 0 && pre) {
      block[0] = (uint8_t)tag;
      bo = 1;
    }
    const size_t in_off = done ? done - pre : 0;
    std::memcpy(block + bo, in + in_off, 128 - bo);
    done += 128;
    S.t0 += 128;
    compress(S, block, false);
  }
  const size_t rem = total - done;  // 0 < rem <= 128, or total == 0
  std::memset(block, 0, 128);
  size_t bo = 0;
  if (done == 0 && pre) {
    block[0] = (uint8_t)tag;
    bo = 1;
  }
  if (rem > bo) {
    const size_t in_off = done ? done - pre : 0;
    std::memcpy(block + bo, in + in_off, rem - bo);
  }
  S.t0 += rem;
  compress(S, block, true);

  uint8_t full[64];
  std::memcpy(full, S.h, 64);
  std::memcpy(out, full, digest_len);
}

}  // namespace

extern "C" {

// Hash n equal-length messages: inputs is n*in_len bytes, outputs n*digest_len.
// tag >= 0 prefixes every message with that byte (domain separation).
void blake2b_batch(const uint8_t *inputs, size_t n, size_t in_len,
                   uint8_t *outputs, size_t digest_len, int tag) {
#pragma omp parallel for schedule(static)
  for (long i = 0; i < (long)n; i++) {
    blake2b_one(tag, inputs + (size_t)i * in_len, in_len,
                outputs + (size_t)i * digest_len, digest_len);
  }
}

// One Merkle layer: 2n digests in, n digests out (hash of concatenated pair).
void blake2b_tree_layer(const uint8_t *digests, size_t n_out,
                        size_t digest_len, uint8_t *out, int tag) {
#pragma omp parallel for schedule(static)
  for (long i = 0; i < (long)n_out; i++) {
    blake2b_one(tag, digests + (size_t)i * 2 * digest_len, 2 * digest_len,
                out + (size_t)i * digest_len, digest_len);
  }
}

// Fiat-Shamir grinding (role of libiop/bcs/pow.tcc solve loop): find the
// SMALLEST nonce with LE64(blake2b_8("pow" || challenge || LE64(nonce)))
// < bound.  Chunked parallel scan with a min-reduction per chunk keeps the
// result identical to the sequential lowest-nonce search (transcripts stay
// byte-identical) while using every core.  Returns UINT64_MAX if
// challenge_len > 64 (caller falls back to the Python loop).
uint64_t blake2b_pow_solve(const uint8_t *challenge, size_t challenge_len,
                           uint64_t bound) {
  if (challenge_len > 64) return ~0ULL;
  const size_t pre_len = 3 + challenge_len;
  const uint64_t CHUNK = 1ULL << 16;
  for (uint64_t base = 0;; base += CHUNK) {
    uint64_t best = ~0ULL;
#pragma omp parallel for reduction(min : best) schedule(static)
    for (long j = 0; j < (long)CHUNK; j++) {
      const uint64_t nonce = base + (uint64_t)j;
      uint8_t msg[3 + 64 + 8];
      msg[0] = 'p'; msg[1] = 'o'; msg[2] = 'w';
      std::memcpy(msg + 3, challenge, challenge_len);
      for (int k = 0; k < 8; k++) msg[pre_len + k] = (uint8_t)(nonce >> (8 * k));
      uint8_t out8[8];
      blake2b_one(-1, msg, pre_len + 8, out8, 8);
      uint64_t v;
      std::memcpy(&v, out8, 8);
      if (v < bound && nonce < best) best = nonce;
    }
    if (best != ~0ULL) return best;
    if (base + CHUNK < base) return ~0ULL;  // wrapped: give up
  }
}
}
