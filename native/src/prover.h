// Host-native Groth16 prover core: Fr NTT, quotient pipeline, Pippenger MSM.
//
// This completes the websnark-engine replacement on the HOST side
// (SURVEY §2.4 row 1): the TPU kernels (zkrollup/{ntt,msm,groth16}) are the
// production compute path; this module is the CPU-backend fast path the
// operator/test tier uses when no TPU is attached (the reference's WASM
// prover played exactly this role for its Node operator). Conventions match
// the JAX pipeline bit-exactly and are differentially tested:
//   - domain root 5^((r-1)/2^28), in-order transforms (zkrollup/ntt/ntt.py)
//   - coset shift g = 5, h = (A*B - C)/Z on g*H (groth16/prove.py)
//   - QAP rows = constraints then public-signal binding rows (groth16/qap.py)
#pragma once

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include "curve.h"
#include "fp.h"

namespace zk {
namespace prover {

// ---------------------------------------------------------------------------
// Fr evaluation domain
// ---------------------------------------------------------------------------

// 5^((r-1)/2^28) mod r, standard form (two-adicity 28)
constexpr u64 ROOT28[4] = {0x9bd61b6e725b19f0ull, 0x402d111e41112ed4ull,
                           0x00e0a7eb8ef62abcull, 0x2a3c09f0a58a7e85ull};

inline Fr domain_root(int log_n, bool inverse) {
  Fr w = Fr::from_std(U256{{ROOT28[0], ROOT28[1], ROOT28[2], ROOT28[3]}});
  for (int i = 0; i < 28 - log_n; ++i) w = Fr::sqr(w);
  return inverse ? Fr::inv(w) : w;
}

inline int log2_exact(size_t n) {
  int l = 0;
  while ((size_t(1) << l) < n) ++l;
  return l;
}

// In-place in-order NTT / iNTT (iNTT includes the 1/n scale), matching
// ntt.py ntt_mont: forward yields evaluations at w^0..w^{n-1}.
inline void fr_ntt(Fr *a, size_t n, bool inverse) {
  int log_n = log2_exact(n);
  for (size_t i = 0; i < n; ++i) {
    size_t r = 0;
    for (int b = 0; b < log_n; ++b) r |= ((i >> b) & 1) << (log_n - 1 - b);
    if (r > i) {
      Fr t = a[i];
      a[i] = a[r];
      a[r] = t;
    }
  }
  Fr w_n = domain_root(log_n, inverse);
  for (int s = 0; s < log_n; ++s) {
    size_t m = size_t(1) << s;
    Fr w_m = w_n;
    for (int i = 0; i < log_n - 1 - s; ++i) w_m = Fr::sqr(w_m);
    for (size_t k = 0; k < n; k += 2 * m) {
      Fr w = Fr::one();
      for (size_t j = 0; j < m; ++j) {
        Fr u = a[k + j];
        Fr v = Fr::mul(a[k + j + m], w);
        a[k + j] = Fr::add(u, v);
        a[k + j + m] = Fr::sub(u, v);
        w = Fr::mul(w, w_m);
      }
    }
  }
  if (inverse) {
    Fr n_inv = Fr::inv(Fr::from_std(U256{{(u64)n, 0, 0, 0}}));
    for (size_t i = 0; i < n; ++i) a[i] = Fr::mul(a[i], n_inv);
  }
}

// multiply element i by g^i (g = 5 forward, 5^-1 inverse) — ntt.py
// coset_scale_mont
inline void coset_scale(Fr *a, size_t n, bool inverse) {
  Fr g = Fr::from_std(U256{{5, 0, 0, 0}});
  if (inverse) g = Fr::inv(g);
  Fr p = Fr::one();
  for (size_t i = 0; i < n; ++i) {
    a[i] = Fr::mul(a[i], p);
    p = Fr::mul(p, g);
  }
}

// Domain evaluations A, B, C (mont, clobbered) -> h coefficients such that
// A(x)B(x) - C(x) = h(x) Z(x); h returned in-place in h_out (mont form).
// Mirrors groth16/prove.py _quotient_plain (minus the final from_mont).
inline void quotient_from_evals(Fr *A, Fr *B, Fr *C, size_t m, Fr *h_out) {
  std::thread ta([&] {
    fr_ntt(A, m, true);
    coset_scale(A, m, false);
    fr_ntt(A, m, false);
  });
  std::thread tb([&] {
    fr_ntt(B, m, true);
    coset_scale(B, m, false);
    fr_ntt(B, m, false);
  });
  fr_ntt(C, m, true);
  coset_scale(C, m, false);
  fr_ntt(C, m, false);
  ta.join();
  tb.join();

  // Z(g*w^i) = g^m - 1, constant on the coset
  Fr g = Fr::from_std(U256{{5, 0, 0, 0}});
  Fr gm = g;
  for (size_t mm = m; mm > 1; mm >>= 1) gm = Fr::sqr(gm);
  Fr zinv = Fr::inv(Fr::sub(gm, Fr::one()));
  for (size_t i = 0; i < m; ++i)
    h_out[i] = Fr::mul(Fr::sub(Fr::mul(A[i], B[i]), C[i]), zinv);
  fr_ntt(h_out, m, true);
  coset_scale(h_out, m, true);
}

// ---------------------------------------------------------------------------
// Sparse A/B/C evaluation (COO mat-vec over the witness)
// ---------------------------------------------------------------------------

struct Coo {
  const uint32_t *row;
  const uint32_t *var;
  const uint8_t *coeff_mont;  // nnz * 32 bytes, raw Montgomery form
  size_t nnz;
};

inline Fr fr_raw_mont(const uint8_t *b) {
  Fr f;
  std::memcpy(f.m.v, b, 32);
  return f;
}

inline void spmv(const Coo &mat, const Fr *w_mont, size_t m_rows, Fr *out) {
  for (size_t i = 0; i < m_rows; ++i) out[i] = Fr::zero();
  for (size_t k = 0; k < mat.nnz; ++k) {
    Fr term = Fr::mul(fr_raw_mont(mat.coeff_mont + 32 * k),
                      w_mont[mat.var[k]]);
    out[mat.row[k]] = Fr::add(out[mat.row[k]], term);
  }
}

// ---------------------------------------------------------------------------
// Pippenger MSM (threaded over windows)
// ---------------------------------------------------------------------------

inline uint32_t scalar_digit(const uint8_t *sc, int bit, int c) {
  uint32_t v = 0;
  for (int i = 0; i < c; ++i) {
    int b = bit + i;
    if (b >= 256) break;
    v |= (uint32_t)((sc[b >> 3] >> (b & 7)) & 1u) << i;
  }
  return v;
}

inline int auto_window(size_t n, int n_bits) {
  int best_c = 2;
  size_t best = SIZE_MAX;
  for (int t = 2; t <= 16; ++t) {
    size_t wn = (size_t)((n_bits + t - 1) / t);
    size_t cost = wn * (n + (size_t(2) << t));
    if (cost < best) {
      best = cost;
      best_c = t;
    }
  }
  return best_c;
}

// scalars: n * 32 bytes LE standard form; pts: affine with inf flags.
template <typename Jac, typename Aff>
inline Jac msm_pippenger(const Aff *pts, const uint8_t *scalars, size_t n,
                         int c, int n_bits = 254) {
  if (c <= 0) c = auto_window(n, n_bits);
  int W = (n_bits + c - 1) / c;
  std::vector<Jac> win((size_t)W, Jac::infinity());

  unsigned hw = std::thread::hardware_concurrency();
  int n_threads = (int)(hw ? hw : 4);
  // ZKH_THREADS pins the pool (bench.py measures the single-core
  // "websnark-class CPU" baseline with ZKH_THREADS=1)
  if (const char *env = std::getenv("ZKH_THREADS")) {
    int v = std::atoi(env);
    if (v > 0) n_threads = v;
  }
  if (n_threads > W) n_threads = W;
  std::atomic<int> next{0};
  auto work = [&]() {
    size_t B = (size_t(1) << c) - 1;
    std::vector<Jac> buckets;
    for (;;) {
      int w = next.fetch_add(1);
      if (w >= W) break;
      buckets.assign(B, Jac::infinity());
      for (size_t i = 0; i < n; ++i) {
        if (pts[i].inf) continue;
        uint32_t d = scalar_digit(scalars + 32 * i, w * c, c);
        if (d)
          buckets[d - 1] =
              Jac::add(buckets[d - 1], Jac::from_affine(pts[i]));
      }
      // weighted sum: suffix-accumulate buckets high -> low
      Jac acc = Jac::infinity();
      Jac tot = Jac::infinity();
      for (size_t b = B; b-- > 0;) {
        acc = Jac::add(acc, buckets[b]);
        tot = Jac::add(tot, acc);
      }
      win[w] = tot;
    }
  };
  std::vector<std::thread> threads;
  for (int t = 1; t < n_threads; ++t) threads.emplace_back(work);
  work();
  for (auto &t : threads) t.join();

  Jac res = Jac::infinity();
  for (int w = W - 1; w >= 0; --w) {
    for (int i = 0; i < c; ++i) res = Jac::dbl(res);
    res = Jac::add(res, win[w]);
  }
  return res;
}

// Jacobian -> affine for a whole array with ONE field inversion
// (Montgomery batch-inversion trick); infinity points pass through.
template <typename Jac, typename Aff>
inline void batch_to_affine(const Jac *pts, size_t n, Aff *out) {
  using F = decltype(Jac::infinity().z);
  std::vector<F> prefix(n + 1);
  prefix[0] = F::one();
  for (size_t i = 0; i < n; ++i) {
    F z = pts[i].z.is_zero() ? F::one() : pts[i].z;
    prefix[i + 1] = F::mul(prefix[i], z);
  }
  F inv_all = F::inv(prefix[n]);
  for (size_t i = n; i-- > 0;) {
    if (pts[i].z.is_zero()) {
      out[i] = {F::zero(), F::zero(), true};
      continue;
    }
    F zi = F::mul(prefix[i], inv_all);        // 1/z_i
    inv_all = F::mul(inv_all, pts[i].z);
    F zi2 = F::sqr(zi);
    out[i] = {F::mul(pts[i].x, zi2), F::mul(pts[i].y, F::mul(zi2, zi)),
              false};
  }
}

// ---------------------------------------------------------------------------
// Fixed-base scalar multiplication (setup tables: one shared base)
// ---------------------------------------------------------------------------

// window width for the precomputed base table
constexpr int FB_C = 8;
constexpr int FB_W = (254 + FB_C - 1) / FB_C;  // 32 windows

template <typename Jac, typename Aff>
struct FixedBaseTable {
  // table[w][d-1] = d * 2^(w*c) * G, d = 1..2^c-1
  std::vector<Aff> table;

  explicit FixedBaseTable(const Jac &gen) {
    size_t B = (size_t(1) << FB_C) - 1;
    std::vector<Jac> jac((size_t)FB_W * B);
    Jac base = gen;
    for (int w = 0; w < FB_W; ++w) {
      Jac acc = Jac::infinity();
      for (size_t d = 0; d < B; ++d) {
        acc = Jac::add(acc, base);
        jac[(size_t)w * B + d] = acc;
      }
      for (int i = 0; i < FB_C; ++i) base = Jac::dbl(base);
    }
    table.resize(jac.size());
    batch_to_affine(jac.data(), jac.size(), table.data());
  }

  Jac mul(const uint8_t *scalar) const {
    size_t B = (size_t(1) << FB_C) - 1;
    Jac acc = Jac::infinity();
    for (int w = 0; w < FB_W; ++w) {
      uint32_t d = scalar_digit(scalar, w * FB_C, FB_C);
      if (d)
        acc = Jac::add(acc, Jac::from_affine(table[(size_t)w * B + d - 1]));
    }
    return acc;
  }
};

// threaded many-scalar fixed-base: out[i] = scalars[i] * G (one batched
// normalization per chunk, not one inversion per point)
template <typename Jac, typename Aff>
inline void fixed_base_many(const FixedBaseTable<Jac, Aff> &tbl,
                            const uint8_t *scalars, size_t n, Aff *out) {
  unsigned hw = std::thread::hardware_concurrency();
  size_t n_threads = hw ? hw : 4;
  if (n_threads > n) n_threads = n ? n : 1;
  std::atomic<size_t> next{0};
  constexpr size_t CHUNK = 512;
  auto work = [&]() {
    std::vector<Jac> jac(CHUNK);
    for (;;) {
      size_t start = next.fetch_add(CHUNK);
      if (start >= n) break;
      size_t end = start + CHUNK < n ? start + CHUNK : n;
      for (size_t i = start; i < end; ++i)
        jac[i - start] = tbl.mul(scalars + 32 * i);
      batch_to_affine(jac.data(), end - start, out + start);
    }
  };
  std::vector<std::thread> threads;
  for (size_t t = 1; t < n_threads; ++t) threads.emplace_back(work);
  work();
  for (auto &t : threads) t.join();
}

}  // namespace prover
}  // namespace zk
