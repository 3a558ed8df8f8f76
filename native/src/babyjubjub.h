// BabyJubJub — twisted Edwards curve embedded in BN254 Fr.
//
// A x^2 + y^2 = 1 + D x^2 y^2, A = 168700, D = 168696. Parity target:
// circomlib babyjub.js as used by the reference's key derivation / EdDSA
// (/root/reference/operator/src/utils/crypto.ts:58-93). Ground truth:
// zkrollup/ref/babyjubjub.py. Internally projective (no per-add inversion);
// one inversion per scalar-mul at the end.
#pragma once

#include "fp.h"

namespace zk {

inline Fr fr_small(u64 v) {
  U256 x{{v, 0, 0, 0}};
  return Fr::from_std(x);
}

struct BjjParams {
  Fr A, D;
  BjjParams() : A(fr_small(168700)), D(fr_small(168696)) {}
};

inline const BjjParams &bjj() {
  static BjjParams p;
  return p;
}

// Projective twisted Edwards point (X : Y : Z), identity = (0 : 1 : 1).
struct BjjPoint {
  Fr x, y, z;

  static BjjPoint identity() { return {Fr::zero(), Fr::one(), Fr::one()}; }

  static BjjPoint from_affine(const Fr &x, const Fr &y) {
    return {x, y, Fr::one()};
  }

  void to_affine(Fr &ax, Fr &ay) const {
    Fr zi = Fr::inv(z);
    ax = Fr::mul(x, zi);
    ay = Fr::mul(y, zi);
  }

  // Bernstein et al. add-2008-bbjlp (complete on BabyJubJub)
  static BjjPoint add(const BjjPoint &p, const BjjPoint &q) {
    const BjjParams &P = bjj();
    Fr a = Fr::mul(p.z, q.z);
    Fr b = Fr::sqr(a);
    Fr c = Fr::mul(p.x, q.x);
    Fr d = Fr::mul(p.y, q.y);
    Fr e = Fr::mul(Fr::mul(P.D, c), d);
    Fr f = Fr::sub(b, e);
    Fr g = Fr::add(b, e);
    Fr x3 = Fr::mul(
        Fr::mul(a, f),
        Fr::sub(Fr::sub(Fr::mul(Fr::add(p.x, p.y), Fr::add(q.x, q.y)), c), d));
    Fr y3 = Fr::mul(Fr::mul(a, g), Fr::sub(d, Fr::mul(P.A, c)));
    Fr z3 = Fr::mul(f, g);
    return {x3, y3, z3};
  }

  // plain double-and-add on the RAW scalar (no reduction), parity with
  // babyjub.js mulPointEscalar; scalar as little-endian u64 words
  static BjjPoint mul(const BjjPoint &p, const u64 *k, int n_limbs) {
    BjjPoint res = identity();
    BjjPoint acc = p;
    for (int i = 0; i < n_limbs; ++i) {
      u64 w = k[i];
      for (int b = 0; b < 64; ++b) {
        if (w & 1) res = add(res, acc);
        acc = add(acc, acc);
        w >>= 1;
      }
    }
    return res;
  }
};

inline bool bjj_on_curve(const Fr &x, const Fr &y) {
  const BjjParams &P = bjj();
  Fr x2 = Fr::sqr(x);
  Fr y2 = Fr::sqr(y);
  Fr lhs = Fr::add(Fr::mul(P.A, x2), y2);
  Fr rhs = Fr::add(Fr::one(), Fr::mul(Fr::mul(P.D, x2), y2));
  return lhs == rhs;
}

}  // namespace zk
