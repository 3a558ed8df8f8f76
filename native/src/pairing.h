// Optimal ate pairing on BN254 + Groth16 pairing-product check.
//
// Host-native replacement for the EVM pairing precompile 0x8 the reference's
// verifiers call (/root/reference/contracts/contracts/TxVerifier.sol:131-160)
// and for snarkjs `groth.isValid` (operator/src/snarks/common.ts:30-38).
// Algorithms mirror zkrollup/ref/bn254.py (affine Miller loop, two Frobenius
// correction lines, easy+hard final exponentiation).
#pragma once

#include "curve.h"

namespace zk {

// 6t + 2 for BN254 t = 4965661367192848881
constexpr u64 ATE_LOOP[2] = {0x9d797039be763ba8ull, 0x1ull};
constexpr int ATE_BITS = 65;  // bit length of 0x19d797039be763ba8

// Line through p1, p2 (affine G2 on the twist) evaluated at t (affine G1),
// as a full Fq12 element. See ref/bn254.py _line for the basis bookkeeping:
// Fq12 over Fq2 basis {1, v, v^2, w, vw, v^2 w} carries w-powers
// {0, 2, 4, 1, 3, 5}.
inline Fq12 line_eval(const G2Affine &p1, const G2Affine &p2,
                      const G1Affine &t) {
  Fq2 xt{t.x, Fq::zero()};
  Fq2 yt{t.y, Fq::zero()};
  Fq2 lam;
  if (!(p1.x == p2.x)) {
    lam = Fq2::mul(Fq2::sub(p2.y, p1.y), Fq2::inv(Fq2::sub(p2.x, p1.x)));
  } else if (Fq2::add(p1.y, p2.y).is_zero()) {
    // vertical: l = xt - x1 * w^2
    Fq12 r{{xt, Fq2::neg(p1.x), Fq2::zero()}, Fq6::zero()};
    return r;
  } else {
    Fq2 x2 = Fq2::sqr(p1.x);
    Fq2 three_x2 = Fq2::add(Fq2::dbl(x2), x2);
    lam = Fq2::mul(three_x2, Fq2::inv(Fq2::dbl(p1.y)));
  }
  // l = yt - lam*xt * w + (lam*x1 - y1) * w^3
  Fq2 c1_0 = Fq2::neg(Fq2::mul(lam, xt));
  Fq2 c1_1 = Fq2::sub(Fq2::mul(lam, p1.x), p1.y);
  return {{yt, Fq2::zero(), Fq2::zero()}, {c1_0, c1_1, Fq2::zero()}};
}

inline G2Affine g2_affine_neg(const G2Affine &p) {
  if (p.inf) return p;
  return {p.x, Fq2::neg(p.y), false};
}

inline G2Affine g2_affine_add(const G2Affine &p, const G2Affine &q) {
  G2 r = G2::add(G2::from_affine(p), G2::from_affine(q));
  return r.to_affine();
}

inline G2Affine g2_affine_dbl(const G2Affine &p) {
  return G2::dbl(G2::from_affine(p)).to_affine();
}

// Frobenius on twisted G2 coords:
// (x, y) -> (conj(x) * xi^((q-1)/3), conj(y) * xi^((q-1)/2))
inline G2Affine g2_frobenius(const G2Affine &p) {
  if (p.inf) return p;
  const FrobCoeffs &f = frob();
  return {Fq2::mul(Fq2::conj(p.x), f.gamma1[2]),
          Fq2::mul(Fq2::conj(p.y), f.gamma1[3]), false};
}

inline Fq12 miller_loop(const G1Affine &p, const G2Affine &q) {
  if (p.inf || q.inf) return Fq12::one();
  Fq12 f = Fq12::one();
  G2Affine r = q;
  // MSB-first over ATE_LOOP, skipping the top bit
  for (int i = ATE_BITS - 2; i >= 0; --i) {
    f = Fq12::mul(Fq12::sqr(f), line_eval(r, r, p));
    r = g2_affine_dbl(r);
    if ((ATE_LOOP[i / 64] >> (i % 64)) & 1) {
      f = Fq12::mul(f, line_eval(r, q, p));
      r = g2_affine_add(r, q);
    }
  }
  G2Affine q1 = g2_frobenius(q);
  G2Affine q2 = g2_affine_neg(g2_frobenius(q1));
  f = Fq12::mul(f, line_eval(r, q1, p));
  r = g2_affine_add(r, q1);
  f = Fq12::mul(f, line_eval(r, q2, p));
  return f;
}

// (q^4 - q^2 + 1) / r, 761 bits
constexpr u64 E_HARD[12] = {
    0xe81bb482ccdf42b1ull, 0x5abf5cc4f49c36d4ull, 0xf1154e7e1da014fdull,
    0xdcc7b44c87cdbacfull, 0xaaa441e3954bcf8aull, 0x6b887d56d5095f23ull,
    0x79581e16f3fd90c6ull, 0x3b1b1355d189227dull, 0x4e529a5861876f6bull,
    0x6c0eb522d5b12278ull, 0x331ec15183177fafull, 0x01baaa710b0759adull};

inline Fq12 final_exponentiation(const Fq12 &f_in) {
  // easy part: f^((q^6 - 1)(q^2 + 1))
  Fq12 f1 = Fq12::conj(f_in);
  Fq12 f2 = Fq12::inv(f_in);
  Fq12 f = Fq12::mul(f1, f2);
  f = Fq12::mul(fq12_frobenius(fq12_frobenius(f)), f);
  // hard part
  return Fq12::pow(f, E_HARD, 12);
}

// prod e(P_i, Q_i) == 1, single final exponentiation
inline bool pairing_product_is_one(const G1Affine *ps, const G2Affine *qs,
                                   int n) {
  Fq12 f = Fq12::one();
  for (int i = 0; i < n; ++i) {
    f = Fq12::mul(f, miller_loop(ps[i], qs[i]));
  }
  return final_exponentiation(f) == Fq12::one();
}

}  // namespace zk
