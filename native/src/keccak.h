// Keccak-256 (Ethereum variant, 0x01 padding) — generates the MiMC round
// constants exactly as circomlib does for the reference's hash
// (/root/reference/contracts/migrations/2_deploy_mimcsponge.js:9-24: iterated
// keccak256 of the ASCII seed). Ground truth: zkrollup/ref/keccak.py.
#pragma once

#include <cstdint>
#include <cstring>

namespace zk {

inline uint64_t rotl64(uint64_t x, int n) {
  return (x << n) | (x >> (64 - n));
}

inline void keccak_f1600(uint64_t st[25]) {
  static const uint64_t RC[24] = {
      0x0000000000000001ull, 0x0000000000008082ull, 0x800000000000808aull,
      0x8000000080008000ull, 0x000000000000808bull, 0x0000000080000001ull,
      0x8000000080008081ull, 0x8000000000008009ull, 0x000000000000008aull,
      0x0000000000000088ull, 0x0000000080008009ull, 0x000000008000000aull,
      0x000000008000808bull, 0x800000000000008bull, 0x8000000000008089ull,
      0x8000000000008003ull, 0x8000000000008002ull, 0x8000000000000080ull,
      0x000000000000800aull, 0x800000008000000aull, 0x8000000080008081ull,
      0x8000000000008080ull, 0x0000000080000001ull, 0x8000000080008008ull};
  // rho-pi walk tables (standard single-temp in-place formulation)
  static const int KP[24] = {10, 7,  11, 17, 18, 3,  5,  16, 8,  21, 24, 4,
                             15, 23, 19, 13, 12, 2,  20, 14, 22, 9,  6,  1};
  static const int KR[24] = {1,  3,  6,  10, 15, 21, 28, 36, 45, 55, 2,  14,
                             27, 41, 56, 8,  25, 43, 62, 18, 39, 61, 20, 44};
  uint64_t bc[5], t;
  for (int round = 0; round < 24; ++round) {
    // theta
    for (int i = 0; i < 5; ++i)
      bc[i] = st[i] ^ st[i + 5] ^ st[i + 10] ^ st[i + 15] ^ st[i + 20];
    for (int i = 0; i < 5; ++i) {
      t = bc[(i + 4) % 5] ^ rotl64(bc[(i + 1) % 5], 1);
      for (int j = 0; j < 25; j += 5) st[j + i] ^= t;
    }
    // rho + pi
    t = st[1];
    for (int i = 0; i < 24; ++i) {
      int j = KP[i];
      bc[0] = st[j];
      st[j] = rotl64(t, KR[i]);
      t = bc[0];
    }
    // chi
    for (int j = 0; j < 25; j += 5) {
      for (int i = 0; i < 5; ++i) bc[i] = st[j + i];
      for (int i = 0; i < 5; ++i)
        st[j + i] = bc[i] ^ ((~bc[(i + 1) % 5]) & bc[(i + 2) % 5]);
    }
    // iota
    st[0] ^= RC[round];
  }
}

inline void keccak256(const uint8_t *in, size_t n, uint8_t out[32]) {
  uint64_t st[25];
  std::memset(st, 0, sizeof(st));
  const size_t rate = 136;  // 1088-bit rate
  uint8_t block[136];
  while (n >= rate) {
    for (size_t i = 0; i < rate / 8; ++i) {
      uint64_t w;
      std::memcpy(&w, in + 8 * i, 8);
      st[i] ^= w;
    }
    keccak_f1600(st);
    in += rate;
    n -= rate;
  }
  std::memset(block, 0, rate);
  std::memcpy(block, in, n);
  block[n] ^= 0x01;  // keccak (pre-SHA3) domain padding
  block[rate - 1] ^= 0x80;
  for (size_t i = 0; i < rate / 8; ++i) {
    uint64_t w;
    std::memcpy(&w, block + 8 * i, 8);
    st[i] ^= w;
  }
  keccak_f1600(st);
  std::memcpy(out, st, 32);
}

}  // namespace zk
