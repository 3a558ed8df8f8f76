// BN254 tower fields Fq2 / Fq6 / Fq12 and Frobenius maps.
//
// Mirrors the pure-Python ground truth (zkrollup/ref/bn254.py): the tower is
// Fq2 = Fq[u]/(u^2+1), Fq6 = Fq2[v]/(v^3 - xi) with xi = 9 + u,
// Fq12 = Fq6[w]/(w^2 - v). Same algorithms (Karatsuba Fq2 mul, CH-SQR-less
// schoolbook Fq6/Fq12), so host results are bit-identical to the Python
// reference and to what the EVM pairing precompile accepts
// (/root/reference/contracts/contracts/TxVerifier.sol:131-160).
#pragma once

#include "fp.h"

namespace zk {

struct Fq2 {
  Fq c0, c1;  // c0 + c1*u

  static Fq2 zero() { return {Fq::zero(), Fq::zero()}; }
  static Fq2 one() { return {Fq::one(), Fq::zero()}; }
  bool is_zero() const { return c0.is_zero() && c1.is_zero(); }
  bool operator==(const Fq2 &o) const { return c0 == o.c0 && c1 == o.c1; }

  static Fq2 add(const Fq2 &a, const Fq2 &b) {
    return {Fq::add(a.c0, b.c0), Fq::add(a.c1, b.c1)};
  }
  static Fq2 sub(const Fq2 &a, const Fq2 &b) {
    return {Fq::sub(a.c0, b.c0), Fq::sub(a.c1, b.c1)};
  }
  static Fq2 neg(const Fq2 &a) { return {Fq::neg(a.c0), Fq::neg(a.c1)}; }
  static Fq2 conj(const Fq2 &a) { return {a.c0, Fq::neg(a.c1)}; }

  static Fq2 mul(const Fq2 &x, const Fq2 &y) {
    Fq ac = Fq::mul(x.c0, y.c0);
    Fq bd = Fq::mul(x.c1, y.c1);
    Fq abcd = Fq::mul(Fq::add(x.c0, x.c1), Fq::add(y.c0, y.c1));
    return {Fq::sub(ac, bd), Fq::sub(Fq::sub(abcd, ac), bd)};
  }

  static Fq2 sqr(const Fq2 &x) {
    Fq t0 = Fq::mul(Fq::add(x.c0, x.c1), Fq::sub(x.c0, x.c1));
    Fq t1 = Fq::dbl(Fq::mul(x.c0, x.c1));
    return {t0, t1};
  }

  static Fq2 scalar(const Fq2 &x, const Fq &k) {
    return {Fq::mul(x.c0, k), Fq::mul(x.c1, k)};
  }

  static Fq2 dbl(const Fq2 &x) { return add(x, x); }

  static Fq2 inv(const Fq2 &x) {
    Fq t = Fq::inv(Fq::add(Fq::sqr(x.c0), Fq::sqr(x.c1)));
    return {Fq::mul(x.c0, t), Fq::neg(Fq::mul(x.c1, t))};
  }

  static Fq2 pow(const Fq2 &a, const u64 *e, int n_limbs) {
    Fq2 result = one();
    Fq2 base = a;
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
};

// xi = 9 + u, the Fq6 non-residue
inline Fq2 fq2_xi() {
  U256 nine{{9, 0, 0, 0}};
  U256 one{{1, 0, 0, 0}};
  return {Fq::from_std(nine), Fq::from_std(one)};
}

inline Fq2 mul_by_xi(const Fq2 &a) {
  // (9 + u) * (c0 + c1 u) = (9 c0 - c1) + (c0 + 9 c1) u
  Fq nine_c0 = Fq::add(Fq::dbl(Fq::dbl(Fq::dbl(a.c0))), a.c0);
  Fq nine_c1 = Fq::add(Fq::dbl(Fq::dbl(Fq::dbl(a.c1))), a.c1);
  return {Fq::sub(nine_c0, a.c1), Fq::add(a.c0, nine_c1)};
}

struct Fq6 {
  Fq2 c0, c1, c2;  // c0 + c1 v + c2 v^2

  static Fq6 zero() { return {Fq2::zero(), Fq2::zero(), Fq2::zero()}; }
  static Fq6 one() { return {Fq2::one(), Fq2::zero(), Fq2::zero()}; }
  bool operator==(const Fq6 &o) const {
    return c0 == o.c0 && c1 == o.c1 && c2 == o.c2;
  }

  static Fq6 add(const Fq6 &a, const Fq6 &b) {
    return {Fq2::add(a.c0, b.c0), Fq2::add(a.c1, b.c1), Fq2::add(a.c2, b.c2)};
  }
  static Fq6 sub(const Fq6 &a, const Fq6 &b) {
    return {Fq2::sub(a.c0, b.c0), Fq2::sub(a.c1, b.c1), Fq2::sub(a.c2, b.c2)};
  }
  static Fq6 neg(const Fq6 &a) {
    return {Fq2::neg(a.c0), Fq2::neg(a.c1), Fq2::neg(a.c2)};
  }

  static Fq6 mul(const Fq6 &x, const Fq6 &y) {
    Fq2 t0 = Fq2::mul(x.c0, y.c0);
    Fq2 t1 = Fq2::mul(x.c1, y.c1);
    Fq2 t2 = Fq2::mul(x.c2, y.c2);
    Fq2 a = Fq2::sub(
        Fq2::mul(Fq2::add(x.c1, x.c2), Fq2::add(y.c1, y.c2)),
        Fq2::add(t1, t2));
    Fq2 b = Fq2::sub(
        Fq2::mul(Fq2::add(x.c0, x.c1), Fq2::add(y.c0, y.c1)),
        Fq2::add(t0, t1));
    Fq2 c = Fq2::sub(
        Fq2::mul(Fq2::add(x.c0, x.c2), Fq2::add(y.c0, y.c2)),
        Fq2::add(t0, t2));
    return {Fq2::add(t0, mul_by_xi(a)), Fq2::add(b, mul_by_xi(t2)),
            Fq2::add(c, t1)};
  }

  static Fq6 sqr(const Fq6 &x) { return mul(x, x); }

  // multiply by v: (c0, c1, c2) -> (xi*c2, c0, c1)
  static Fq6 mul_by_v(const Fq6 &x) { return {mul_by_xi(x.c2), x.c0, x.c1}; }

  static Fq6 inv(const Fq6 &x) {
    Fq2 c0 = Fq2::sub(Fq2::sqr(x.c0), mul_by_xi(Fq2::mul(x.c1, x.c2)));
    Fq2 c1 = Fq2::sub(mul_by_xi(Fq2::sqr(x.c2)), Fq2::mul(x.c0, x.c1));
    Fq2 c2 = Fq2::sub(Fq2::sqr(x.c1), Fq2::mul(x.c0, x.c2));
    Fq2 t = Fq2::inv(Fq2::add(
        Fq2::mul(x.c0, c0),
        mul_by_xi(Fq2::add(Fq2::mul(x.c2, c1), Fq2::mul(x.c1, c2)))));
    return {Fq2::mul(c0, t), Fq2::mul(c1, t), Fq2::mul(c2, t)};
  }
};

struct Fq12 {
  Fq6 c0, c1;  // c0 + c1 w

  static Fq12 one() { return {Fq6::one(), Fq6::zero()}; }
  bool operator==(const Fq12 &o) const { return c0 == o.c0 && c1 == o.c1; }

  static Fq12 mul(const Fq12 &x, const Fq12 &y) {
    Fq6 t0 = Fq6::mul(x.c0, y.c0);
    Fq6 t1 = Fq6::mul(x.c1, y.c1);
    Fq6 a = Fq6::add(t0, Fq6::mul_by_v(t1));
    Fq6 b = Fq6::sub(
        Fq6::mul(Fq6::add(x.c0, x.c1), Fq6::add(y.c0, y.c1)),
        Fq6::add(t0, t1));
    return {a, b};
  }

  static Fq12 sqr(const Fq12 &x) { return mul(x, x); }

  static Fq12 conj(const Fq12 &x) { return {x.c0, Fq6::neg(x.c1)}; }

  static Fq12 inv(const Fq12 &x) {
    Fq6 t = Fq6::inv(Fq6::sub(Fq6::sqr(x.c0), Fq6::mul_by_v(Fq6::sqr(x.c1))));
    return {Fq6::mul(x.c0, t), Fq6::neg(Fq6::mul(x.c1, t))};
  }

  static Fq12 pow(const Fq12 &a, const u64 *e, int n_limbs) {
    Fq12 result = one();
    Fq12 base = a;
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
};

// Frobenius gamma coefficients: xi^(i*(q-1)/6), i = 0..5, computed once.
struct FrobCoeffs {
  Fq2 gamma1[6];
  FrobCoeffs() {
    static constexpr u64 QM1D6[4] = {0x34b017592414d4e1ull,
                                     0xee9591c2e6bda1c2ull,
                                     0xf40d60f3c0403964ull,
                                     0x0810b7bdd032f006ull};
    Fq2 g = Fq2::pow(fq2_xi(), QM1D6, 4);
    Fq2 acc = Fq2::one();
    for (int i = 0; i < 6; ++i) {
      gamma1[i] = acc;
      acc = Fq2::mul(acc, g);
    }
  }
};

inline const FrobCoeffs &frob() {
  static FrobCoeffs f;
  return f;
}

// x -> x^q on Fq12 (matches ref/bn254.py fq12_frobenius)
inline Fq12 fq12_frobenius(const Fq12 &x) {
  const FrobCoeffs &f = frob();
  Fq2 a0 = Fq2::conj(x.c0.c0);
  Fq2 a1 = Fq2::mul(Fq2::conj(x.c0.c1), f.gamma1[2]);
  Fq2 a2 = Fq2::mul(Fq2::conj(x.c0.c2), f.gamma1[4]);
  Fq2 b0 = Fq2::mul(Fq2::conj(x.c1.c0), f.gamma1[1]);
  Fq2 b1 = Fq2::mul(Fq2::conj(x.c1.c1), f.gamma1[3]);
  Fq2 b2 = Fq2::mul(Fq2::conj(x.c1.c2), f.gamma1[5]);
  return {{a0, a1, a2}, {b0, b1, b2}};
}

}  // namespace zk
