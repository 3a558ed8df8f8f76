// 256-bit Montgomery field arithmetic over 4x64-bit limbs.
//
// This is the host-native engine of the framework: the role websnark's
// hand-built WASM bn128 module plays for the reference
// (/root/reference/operator/src/utils/binarify.ts packs keys into the same
// R = 2^256 Montgomery form; SURVEY §2.4 row 1). The TPU kernels use 16x16-bit
// limbs (zkrollup/fields/limbs.py); the host uses 4x64 with __uint128_t
// partial products — each side is shaped for its hardware, both match the
// pure-Python ground truth (zkrollup/ref/bn254.py) bit-exactly.
#pragma once

#include <cstdint>
#include <cstring>

namespace zk {

using u64 = uint64_t;
using u128 = unsigned __int128;

struct U256 {
  u64 v[4];
};

inline bool u256_eq(const U256 &a, const U256 &b) {
  return a.v[0] == b.v[0] && a.v[1] == b.v[1] && a.v[2] == b.v[2] &&
         a.v[3] == b.v[3];
}

inline bool u256_is_zero(const U256 &a) {
  return (a.v[0] | a.v[1] | a.v[2] | a.v[3]) == 0;
}

// a >= b
inline bool u256_geq(const U256 &a, const U256 &b) {
  for (int i = 3; i >= 0; --i) {
    if (a.v[i] != b.v[i]) return a.v[i] > b.v[i];
  }
  return true;
}

inline U256 u256_sub(const U256 &a, const U256 &b) {
  U256 r;
  u64 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a.v[i] - b.v[i] - borrow;
    r.v[i] = (u64)d;
    borrow = (u64)(d >> 64) & 1;
  }
  return r;
}

inline U256 u256_add(const U256 &a, const U256 &b, u64 *carry_out) {
  U256 r;
  u64 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a.v[i] + b.v[i] + carry;
    r.v[i] = (u64)s;
    carry = (u64)(s >> 64);
  }
  if (carry_out) *carry_out = carry;
  return r;
}

// Field parameter bundles. Values are plain (standard-form) constants; the
// Fp<> wrapper below keeps elements in Montgomery form internally.
struct FqParams {
  static constexpr u64 MOD[4] = {0x3c208c16d87cfd47ull, 0x97816a916871ca8dull,
                                 0xb85045b68181585dull, 0x30644e72e131a029ull};
  static constexpr u64 N0INV = 0x87d20782e4866389ull;
  static constexpr u64 R2[4] = {0xf32cfc5b538afa89ull, 0xb5e71911d44501fbull,
                                0x47ab1eff0a417ff6ull, 0x06d89f71cab8351full};
  static constexpr u64 RMODP[4] = {0xd35d438dc58f0d9dull, 0x0a78eb28f5c70b3dull,
                                   0x666ea36f7879462cull, 0x0e0a77c19a07df2full};
};

struct FrParams {
  static constexpr u64 MOD[4] = {0x43e1f593f0000001ull, 0x2833e84879b97091ull,
                                 0xb85045b68181585dull, 0x30644e72e131a029ull};
  static constexpr u64 N0INV = 0xc2e1f593efffffffull;
  static constexpr u64 R2[4] = {0x1bb8e645ae216da7ull, 0x53fe3ab1e35c59e3ull,
                                0x8c49833d53bb8085ull, 0x0216d0b17f4e44a5ull};
  static constexpr u64 RMODP[4] = {0xac96341c4ffffffbull, 0x36fc76959f60cd29ull,
                                   0x666ea36f7879462eull, 0x0e0a77c19a07df2full};
};

template <typename P>
struct Fp {
  U256 m;  // Montgomery form: value * 2^256 mod p

  static U256 mod() {
    U256 r;
    std::memcpy(r.v, P::MOD, sizeof(r.v));
    return r;
  }

  static Fp zero() { return Fp{{{0, 0, 0, 0}}}; }

  static Fp one() {
    Fp r;
    std::memcpy(r.m.v, P::RMODP, sizeof(r.m.v));
    return r;
  }

  bool is_zero() const { return u256_is_zero(m); }
  bool operator==(const Fp &o) const { return u256_eq(m, o.m); }

  // CIOS Montgomery multiplication: a*b*2^-256 mod p, inputs/outputs < p.
  static Fp mul(const Fp &a, const Fp &b) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; ++i) {
      // t += a[i] * b
      u64 carry = 0;
      for (int j = 0; j < 4; ++j) {
        u128 s = (u128)a.m.v[i] * b.m.v[j] + t[j] + carry;
        t[j] = (u64)s;
        carry = (u64)(s >> 64);
      }
      u128 s = (u128)t[4] + carry;
      t[4] = (u64)s;
      t[5] = (u64)(s >> 64);
      // m = t[0] * n0inv; t += m * p; t >>= 64
      u64 mfac = t[0] * P::N0INV;
      u128 c = (u128)mfac * P::MOD[0] + t[0];
      carry = (u64)(c >> 64);
      for (int j = 1; j < 4; ++j) {
        c = (u128)mfac * P::MOD[j] + t[j] + carry;
        t[j - 1] = (u64)c;
        carry = (u64)(c >> 64);
      }
      c = (u128)t[4] + carry;
      t[3] = (u64)c;
      t[4] = t[5] + (u64)(c >> 64);
      t[5] = 0;
    }
    U256 r{{t[0], t[1], t[2], t[3]}};
    if (t[4] || u256_geq(r, mod())) r = u256_sub(r, mod());
    return Fp{r};
  }

  static Fp sqr(const Fp &a) { return mul(a, a); }

  static Fp add(const Fp &a, const Fp &b) {
    u64 carry;
    U256 s = u256_add(a.m, b.m, &carry);
    if (carry || u256_geq(s, mod())) s = u256_sub(s, mod());
    return Fp{s};
  }

  static Fp sub(const Fp &a, const Fp &b) {
    if (u256_geq(a.m, b.m)) return Fp{u256_sub(a.m, b.m)};
    u64 carry;
    U256 s = u256_add(a.m, mod(), &carry);
    (void)carry;  // cannot overflow: a < p, so a + p < 2p < 2^256
    return Fp{u256_sub(s, b.m)};
  }

  static Fp neg(const Fp &a) {
    if (a.is_zero()) return a;
    return Fp{u256_sub(mod(), a.m)};
  }

  static Fp dbl(const Fp &a) { return add(a, a); }

  // a^e for a multi-limb exponent (n_limbs little-endian u64s).
  static Fp pow(const Fp &a, const u64 *e, int n_limbs) {
    Fp result = one();
    Fp base = a;
    for (int i = 0; i < n_limbs; ++i) {
      u64 w = e[i];
      for (int b = 0; b < 64; ++b) {
        if (w & 1) result = mul(result, base);
        base = sqr(base);
        w >>= 1;
      }
    }
    return result;
  }

  // Fermat inversion: a^(p-2).
  static Fp inv(const Fp &a) {
    U256 e = u256_sub(mod(), U256{{2, 0, 0, 0}});
    return pow(a, e.v, 4);
  }

  // standard form <-> Montgomery form
  static Fp from_std(const U256 &x) {
    // reduce x mod p first (x may be any 256-bit value, < ~4.4p for BN254)
    U256 r = x;
    while (u256_geq(r, mod())) r = u256_sub(r, mod());
    Fp r2;
    std::memcpy(r2.m.v, P::R2, sizeof(r2.m.v));
    return mul(Fp{r}, r2);
  }

  U256 to_std() const {
    Fp one_plain{{{1, 0, 0, 0}}};
    return mul(*this, one_plain).m;
  }
};

using Fq = Fp<FqParams>;
using Fr = Fp<FrParams>;

// 32-byte little-endian <-> U256
inline U256 u256_from_bytes(const uint8_t *b) {
  U256 r;
  std::memcpy(r.v, b, 32);
  return r;
}

inline void u256_to_bytes(const U256 &x, uint8_t *b) {
  std::memcpy(b, x.v, 32);
}

}  // namespace zk
