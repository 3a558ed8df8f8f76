// BN254 G1/G2 point arithmetic (Jacobian internally, affine at the API).
//
// Equivalent of websnark's curve module and the EVM precompiles 0x6/0x7
// (G1 add / scalar-mul) the reference's verifier calls
// (/root/reference/contracts/contracts/TxVerifier.sol:56-113). Ground truth:
// zkrollup/ref/bn254.py g1_*/g2_*.
#pragma once

#include "tower.h"

namespace zk {

// Affine point over field F; inf flag marks the identity.
template <typename F>
struct AffinePoint {
  F x, y;
  bool inf;
};

// Jacobian: (X, Y, Z) with x = X/Z^2, y = Y/Z^3; Z == 0 is infinity.
template <typename F>
struct JacPoint {
  F x, y, z;

  static JacPoint infinity() {
    return {F::one(), F::one(), F::zero()};
  }
  bool is_inf() const { return z.is_zero(); }

  static JacPoint from_affine(const AffinePoint<F> &a) {
    if (a.inf) return infinity();
    return {a.x, a.y, F::one()};
  }

  AffinePoint<F> to_affine() const {
    if (is_inf()) return {F::zero(), F::zero(), true};
    F zi = F::inv(z);
    F zi2 = F::sqr(zi);
    return {F::mul(x, zi2), F::mul(y, F::mul(zi2, zi)), false};
  }

  static JacPoint dbl(const JacPoint &p) {
    if (p.is_inf()) return p;
    // 2007 Bernstein-Lange dbl-2007-bl (a = 0 curves)
    F a = F::sqr(p.x);
    F b = F::sqr(p.y);
    F c = F::sqr(b);
    F d = F::dbl(F::sub(F::sub(F::sqr(F::add(p.x, b)), a), c));
    F e = F::add(F::dbl(a), a);  // 3a
    F f = F::sqr(e);
    F x3 = F::sub(f, F::dbl(d));
    F c8 = F::dbl(F::dbl(F::dbl(c)));
    F y3 = F::sub(F::mul(e, F::sub(d, x3)), c8);
    F z3 = F::dbl(F::mul(p.y, p.z));
    return {x3, y3, z3};
  }

  static JacPoint add(const JacPoint &p, const JacPoint &q) {
    if (p.is_inf()) return q;
    if (q.is_inf()) return p;
    F z1z1 = F::sqr(p.z);
    F z2z2 = F::sqr(q.z);
    F u1 = F::mul(p.x, z2z2);
    F u2 = F::mul(q.x, z1z1);
    F s1 = F::mul(p.y, F::mul(q.z, z2z2));
    F s2 = F::mul(q.y, F::mul(p.z, z1z1));
    if (u1 == u2) {
      if (!(s1 == s2)) return infinity();
      return dbl(p);
    }
    F h = F::sub(u2, u1);
    F i = F::sqr(F::dbl(h));
    F j = F::mul(h, i);
    F r = F::dbl(F::sub(s2, s1));
    F v = F::mul(u1, i);
    F x3 = F::sub(F::sub(F::sqr(r), j), F::dbl(v));
    F y3 = F::sub(F::mul(r, F::sub(v, x3)), F::dbl(F::mul(s1, j)));
    F z3 = F::mul(F::dbl(F::mul(p.z, q.z)), h);
    return {x3, y3, z3};
  }

  // scalar from multi-limb little-endian words (any length)
  static JacPoint mul(const JacPoint &p, const u64 *k, int n_limbs) {
    JacPoint res = infinity();
    JacPoint acc = p;
    for (int i = 0; i < n_limbs; ++i) {
      u64 w = k[i];
      for (int b = 0; b < 64; ++b) {
        if (w & 1) res = add(res, acc);
        acc = dbl(acc);
        w >>= 1;
      }
    }
    return res;
  }
};

using G1Affine = AffinePoint<Fq>;
using G2Affine = AffinePoint<Fq2>;
using G1 = JacPoint<Fq>;
using G2 = JacPoint<Fq2>;

inline Fq fq_small(u64 v) {
  U256 x{{v, 0, 0, 0}};
  return Fq::from_std(x);
}

// y^2 == x^3 + 3
inline bool g1_on_curve(const G1Affine &p) {
  if (p.inf) return true;
  Fq lhs = Fq::sqr(p.y);
  Fq rhs = Fq::add(Fq::mul(Fq::sqr(p.x), p.x), fq_small(3));
  return lhs == rhs;
}

// twist b = 3 / xi
inline Fq2 g2_b() {
  Fq2 three{fq_small(3), Fq::zero()};
  return Fq2::mul(three, Fq2::inv(fq2_xi()));
}

inline bool g2_on_curve(const G2Affine &p) {
  if (p.inf) return true;
  Fq2 lhs = Fq2::sqr(p.y);
  Fq2 rhs = Fq2::add(Fq2::mul(Fq2::sqr(p.x), p.x), g2_b());
  return lhs == rhs;
}

}  // namespace zk
