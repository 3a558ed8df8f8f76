// MiMCSponge (220 rounds) and MiMC7 (91 rounds) over BN254 Fr.
//
// The rollup's universal hash: tree nodes/leaves, tx serialization, EdDSA
// internals (/root/reference/operator/src/utils/crypto.ts:28-38,
// helpers.ts:75-82). Round constants are iterated keccak256 of the ASCII
// seed, first/last zeroed, exactly circomlib 0.0.20's generator (the same
// one that emits the reference's on-chain MiMCSponge bytecode —
// migrations/2_deploy_mimcsponge.js:9-24). Ground truth: zkrollup/ref/mimc.py.
#pragma once

#include "fp.h"
#include "keccak.h"

namespace zk {

constexpr int MIMC_SPONGE_ROUNDS = 220;
constexpr int MIMC7_ROUNDS = 91;

inline Fr fr_from_be_bytes(const uint8_t be[32]) {
  U256 x;
  uint8_t le[32];
  for (int i = 0; i < 32; ++i) le[i] = be[31 - i];
  std::memcpy(x.v, le, 32);
  return Fr::from_std(x);
}

struct MimcConstants {
  Fr sponge[MIMC_SPONGE_ROUNDS];
  Fr mimc7[MIMC7_ROUNDS];

  MimcConstants() {
    uint8_t c[32];
    // cts[0] = 0, cts[i] = keccak^(i+1)(seed) mod r, cts[last] = 0
    keccak256((const uint8_t *)"mimcsponge", 10, c);
    sponge[0] = Fr::zero();
    for (int i = 1; i < MIMC_SPONGE_ROUNDS; ++i) {
      keccak256(c, 32, c);
      sponge[i] = fr_from_be_bytes(c);
    }
    sponge[MIMC_SPONGE_ROUNDS - 1] = Fr::zero();

    keccak256((const uint8_t *)"mimc", 4, c);
    mimc7[0] = Fr::zero();
    for (int i = 1; i < MIMC7_ROUNDS; ++i) {
      keccak256(c, 32, c);
      mimc7[i] = fr_from_be_bytes(c);
    }
  }
};

inline const MimcConstants &mimc_cts() {
  static MimcConstants c;
  return c;
}

// (xL, xR) -> permuted, key k. All Montgomery-form Fr.
inline void mimc_sponge_permute(Fr &xl, Fr &xr, const Fr &k) {
  const MimcConstants &C = mimc_cts();
  for (int i = 0; i < MIMC_SPONGE_ROUNDS; ++i) {
    Fr t = Fr::add(Fr::add(xl, k), C.sponge[i]);
    Fr t2 = Fr::sqr(t);
    Fr t5 = Fr::mul(Fr::mul(t2, t2), t);
    if (i < MIMC_SPONGE_ROUNDS - 1) {
      Fr nl = Fr::add(xr, t5);
      xr = xl;
      xl = nl;
    } else {
      xr = Fr::add(xr, t5);
    }
  }
}

// multiHash with numOutputs=1: absorb R += v; permute.
inline Fr mimc_multi_hash(const Fr *vals, size_t n, const Fr &key) {
  Fr r = Fr::zero(), c = Fr::zero();
  for (size_t i = 0; i < n; ++i) {
    r = Fr::add(r, vals[i]);
    mimc_sponge_permute(r, c, key);
  }
  return r;
}

// MiMC7: x^7 rounds, seed "mimc" (used by the operator's ECDH stream cipher,
// crypto.ts:95-141)
inline Fr mimc7_hash(const Fr &x, const Fr &k) {
  const MimcConstants &C = mimc_cts();
  Fr r = Fr::zero();
  for (int i = 0; i < MIMC7_ROUNDS; ++i) {
    Fr t = (i == 0) ? Fr::add(x, k) : Fr::add(Fr::add(r, k), C.mimc7[i]);
    Fr t2 = Fr::sqr(t);
    Fr t4 = Fr::sqr(t2);
    r = Fr::mul(Fr::mul(t4, t2), t);
  }
  return Fr::add(r, k);
}

inline Fr mimc7_multi_hash(const Fr *vals, size_t n, const Fr &key) {
  Fr r = key;
  for (size_t i = 0; i < n; ++i) {
    r = Fr::add(Fr::add(r, vals[i]), mimc7_hash(vals[i], r));
  }
  return r;
}

}  // namespace zk
