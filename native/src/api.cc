// libzkhost — C API (ctypes) for the host-native crypto engine.
//
// This shared library is the framework's native runtime tier: the role the
// reference delegates to websnark's WASM bn128 module + circomlib's generated
// EVM bytecode (SURVEY §2.4). The TPU does the batch math (Pallas/XLA); this
// library does the host-side single-shot math at native speed: MiMC hashing
// for tree/operator state, BabyJubJub for signatures, BN254 pairing for the
// mandatory Groth16 self-verify (operator/src/snarks/common.ts:30-38).
//
// Conventions:
//   field element  = 32-byte little-endian standard-form integer
//   G1 point       = 65 bytes: x | y | inf-flag
//   G2 point       = 129 bytes: x.c0 | x.c1 | y.c0 | y.c1 | inf-flag
//   return codes   : 1 = true/ok, 0 = false, -1 = malformed input

#include <cstdint>
#include <cstring>
#include <vector>

#include "babyjubjub.h"
#include "curve.h"
#include "mimc.h"
#include "pairing.h"
#include "prover.h"

using namespace zk;

namespace {

bool coord_in_range_q(const uint8_t *b) {
  return !u256_geq(u256_from_bytes(b), Fq::mod());
}

bool read_g1(const uint8_t *buf, G1Affine *out) {
  if (buf[64]) {
    *out = {Fq::zero(), Fq::zero(), true};
    return true;
  }
  if (!coord_in_range_q(buf) || !coord_in_range_q(buf + 32)) return false;
  out->x = Fq::from_std(u256_from_bytes(buf));
  out->y = Fq::from_std(u256_from_bytes(buf + 32));
  out->inf = false;
  return true;
}

void write_g1(const G1Affine &p, uint8_t *buf) {
  std::memset(buf, 0, 65);
  if (p.inf) {
    buf[64] = 1;
    return;
  }
  u256_to_bytes(p.x.to_std(), buf);
  u256_to_bytes(p.y.to_std(), buf + 32);
}

bool read_g2(const uint8_t *buf, G2Affine *out) {
  if (buf[128]) {
    *out = {Fq2::zero(), Fq2::zero(), true};
    return true;
  }
  for (int i = 0; i < 4; ++i) {
    if (!coord_in_range_q(buf + 32 * i)) return false;
  }
  out->x = {Fq::from_std(u256_from_bytes(buf)),
            Fq::from_std(u256_from_bytes(buf + 32))};
  out->y = {Fq::from_std(u256_from_bytes(buf + 64)),
            Fq::from_std(u256_from_bytes(buf + 96))};
  out->inf = false;
  return true;
}

void write_g2(const G2Affine &p, uint8_t *buf) {
  std::memset(buf, 0, 129);
  if (p.inf) {
    buf[128] = 1;
    return;
  }
  u256_to_bytes(p.x.c0.to_std(), buf);
  u256_to_bytes(p.x.c1.to_std(), buf + 32);
  u256_to_bytes(p.y.c0.to_std(), buf + 64);
  u256_to_bytes(p.y.c1.to_std(), buf + 96);
}

Fr fr_read(const uint8_t *b) { return Fr::from_std(u256_from_bytes(b)); }

void fr_write(const Fr &v, uint8_t *b) { u256_to_bytes(v.to_std(), b); }

// scalar bytes (LE, arbitrary length) -> u64 word vector
std::vector<u64> scalar_words(const uint8_t *k, size_t len) {
  std::vector<u64> w((len + 7) / 8, 0);
  std::memcpy(w.data(), k, len);
  return w;
}

}  // namespace

extern "C" {

int zkh_version() { return 4; }

// ---------------------------------------------------------------------------
// keccak / MiMC
// ---------------------------------------------------------------------------

void zkh_keccak256(const uint8_t *in, size_t n, uint8_t *out32) {
  keccak256(in, n, out32);
}

// one sponge multiHash over n inputs
void zkh_mimc_multihash(const uint8_t *vals, size_t n, const uint8_t *key,
                        uint8_t *out) {
  std::vector<Fr> v(n);
  for (size_t i = 0; i < n; ++i) v[i] = fr_read(vals + 32 * i);
  fr_write(mimc_multi_hash(v.data(), n, fr_read(key)), out);
}

// hash n_rows independent rows of row_len elements each (batch tree/leaf
// hashing; rows laid out contiguously)
void zkh_mimc_multihash_many(const uint8_t *rows, size_t n_rows,
                             size_t row_len, const uint8_t *key,
                             uint8_t *outs) {
  Fr k = fr_read(key);
  std::vector<Fr> v(row_len);
  for (size_t r = 0; r < n_rows; ++r) {
    const uint8_t *row = rows + 32 * row_len * r;
    for (size_t i = 0; i < row_len; ++i) v[i] = fr_read(row + 32 * i);
    fr_write(mimc_multi_hash(v.data(), row_len, k), outs + 32 * r);
  }
}

void zkh_mimc7_hash(const uint8_t *x, const uint8_t *k, uint8_t *out) {
  fr_write(mimc7_hash(fr_read(x), fr_read(k)), out);
}

void zkh_mimc7_multihash(const uint8_t *vals, size_t n, const uint8_t *key,
                         uint8_t *out) {
  std::vector<Fr> v(n);
  for (size_t i = 0; i < n; ++i) v[i] = fr_read(vals + 32 * i);
  fr_write(mimc7_multi_hash(v.data(), n, fr_read(key)), out);
}

// ---------------------------------------------------------------------------
// BN254 G1 / G2
// ---------------------------------------------------------------------------

int zkh_g1_on_curve(const uint8_t *p) {
  G1Affine a;
  if (!read_g1(p, &a)) return -1;
  return g1_on_curve(a) ? 1 : 0;
}

int zkh_g2_on_curve(const uint8_t *p) {
  G2Affine a;
  if (!read_g2(p, &a)) return -1;
  return g2_on_curve(a) ? 1 : 0;
}

int zkh_g1_add(const uint8_t *pa, const uint8_t *pb, uint8_t *out) {
  G1Affine a, b;
  if (!read_g1(pa, &a) || !read_g1(pb, &b)) return -1;
  write_g1(G1::add(G1::from_affine(a), G1::from_affine(b)).to_affine(), out);
  return 1;
}

int zkh_g1_mul(const uint8_t *p, const uint8_t *k, size_t k_len,
               uint8_t *out) {
  G1Affine a;
  if (!read_g1(p, &a)) return -1;
  auto w = scalar_words(k, k_len);
  write_g1(G1::mul(G1::from_affine(a), w.data(), (int)w.size()).to_affine(),
           out);
  return 1;
}

int zkh_g2_add(const uint8_t *pa, const uint8_t *pb, uint8_t *out) {
  G2Affine a, b;
  if (!read_g2(pa, &a) || !read_g2(pb, &b)) return -1;
  write_g2(G2::add(G2::from_affine(a), G2::from_affine(b)).to_affine(), out);
  return 1;
}

int zkh_g2_mul(const uint8_t *p, const uint8_t *k, size_t k_len,
               uint8_t *out) {
  G2Affine a;
  if (!read_g2(p, &a)) return -1;
  auto w = scalar_words(k, k_len);
  write_g2(G2::mul(G2::from_affine(a), w.data(), (int)w.size()).to_affine(),
           out);
  return 1;
}

// sum_i k_i * P_i over G1 (host-side multiexp for small tables, e.g. the
// verifier's vk_x combination). points: n*65, scalars: n*32.
int zkh_g1_msm(const uint8_t *pts, const uint8_t *scalars, size_t n,
               uint8_t *out) {
  G1 acc = G1::infinity();
  for (size_t i = 0; i < n; ++i) {
    G1Affine a;
    if (!read_g1(pts + 65 * i, &a)) return -1;
    U256 k = u256_from_bytes(scalars + 32 * i);
    acc = G1::add(acc, G1::mul(G1::from_affine(a), k.v, 4));
  }
  write_g1(acc.to_affine(), out);
  return 1;
}

// ---------------------------------------------------------------------------
// GLV scalar decomposition (msm/glv.py host fast path)
// ---------------------------------------------------------------------------

namespace {

// schoolbook multiply: a[na] * b[nb] -> out[na+nb] (u64 limbs, LE)
void mp_mul(const u64 *a, int na, const u64 *b, int nb, u64 *out) {
  for (int i = 0; i < na + nb; ++i) out[i] = 0;
  for (int i = 0; i < na; ++i) {
    u64 carry = 0;
    for (int j = 0; j < nb; ++j) {
      u128 cur = (u128)a[i] * b[j] + out[i + j] + carry;
      out[i + j] = (u64)cur;
      carry = (u64)(cur >> 64);
    }
    out[i + nb] += carry;
  }
}

// out -= a*b (mod 2^256), a: 3 limbs, b: 2 limbs
void sub_mul_256(u64 out[4], const u64 *a, const u64 *b) {
  u64 prod[5];
  mp_mul(a, 3, b, 2, prod);
  u64 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)out[i] - prod[i] - borrow;
    out[i] = (u64)d;
    borrow = (u64)(d >> 64) & 1;
  }
}

void add_mul_256(u64 out[4], const u64 *a, const u64 *b) {
  u64 prod[5];
  mp_mul(a, 3, b, 2, prod);
  u64 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)out[i] + prod[i] + carry;
    out[i] = (u64)s;
    carry = (u64)(s >> 64);
  }
}

// c = round(k * g / 2^384) via (k*g + 2^383) >> 384; k 4 limbs, g 5 limbs,
// c -> 3 limbs
void glv_round_div(const u64 k[4], const u64 g[5], u64 c[3]) {
  u64 prod[9];
  mp_mul(k, 4, g, 5, prod);
  // add 2^383 (limb 5, bit 63) with carry ripple
  u128 s = (u128)prod[5] + 0x8000000000000000ull;
  prod[5] = (u64)s;
  u64 carry = (u64)(s >> 64);
  for (int i = 6; i < 9 && carry; ++i) {
    s = (u128)prod[i] + carry;
    prod[i] = (u64)s;
    carry = (u64)(s >> 64);
  }
  c[0] = prod[6];
  c[1] = prod[7];
  c[2] = prod[8];
}

// GLV lattice constants (zkrollup/msm/glv.py; verified in tests)
constexpr u64 GLV_G1C[5] = {0x8fa7d32d2fafba64ull, 0x6eb9c714773a6ef2ull,
                            0xd91d232ec7e0b3d7ull, 0x2ull, 0x0ull};
constexpr u64 GLV_G2C[5] = {0x869375169b9bdffaull, 0xa5e38cfb5eaa26d9ull,
                            0x7a7bd9d4391eb18dull, 0x4ccef014a773d2cfull,
                            0x2ull};
constexpr u64 GLV_A1[2] = {0x89d3256894d213e3ull, 0x0ull};
constexpr u64 GLV_A2[2] = {0xbe4e1541221250bull, 0x6f4d8248eeb859fdull};
constexpr u64 GLV_B1[2] = {0x8211bbeb7d4f1128ull, 0x6f4d8248eeb859fcull};
constexpr u64 GLV_B2[2] = {0x89d3256894d213e3ull, 0x0ull};

}  // namespace

// scalars: n * 32 bytes LE (values < r). Outputs: abs_out = 2n * 32 bytes LE
// (|k1| rows then |k2| rows), neg_out = 2n bytes (1 = negative).
// k = k1 + k2*lambda (mod r), |k1|,|k2| < 2^129.
void zkh_glv_decompose(const uint8_t *scalars, size_t n, uint8_t *abs_out,
                       uint8_t *neg_out) {
  for (size_t idx = 0; idx < n; ++idx) {
    u64 k[4];
    std::memcpy(k, scalars + 32 * idx, 32);
    u64 c1[3], c2[3];
    glv_round_div(k, GLV_G1C, c1);
    glv_round_div(k, GLV_G2C, c2);

    // k1 = k - c1*A1 - c2*A2 (wrapping 2^256, signed)
    u64 k1[4];
    std::memcpy(k1, k, 32);
    sub_mul_256(k1, c1, GLV_A1);
    sub_mul_256(k1, c2, GLV_A2);
    // k2 = c1*B1 - c2*B2 (wrapping, signed)
    u64 k2[4] = {0, 0, 0, 0};
    add_mul_256(k2, c1, GLV_B1);
    sub_mul_256(k2, c2, GLV_B2);

    u64 *halves[2] = {k1, k2};
    for (int h = 0; h < 2; ++h) {
      u64 *v = halves[h];
      bool neg = (v[3] >> 63) != 0;
      if (neg) {  // two's complement negate
        u64 carry = 1;
        for (int i = 0; i < 4; ++i) {
          u64 nv = ~v[i];
          u128 s = (u128)nv + carry;
          v[i] = (u64)s;
          carry = (u64)(s >> 64);
        }
      }
      std::memcpy(abs_out + 32 * (h * n + idx), v, 32);
      neg_out[h * n + idx] = neg ? 1 : 0;
    }
  }
}

// ---------------------------------------------------------------------------
// Pairing + Groth16 verify
// ---------------------------------------------------------------------------

// prod e(P_i, Q_i) == 1. g1s: n*65 bytes, g2s: n*129 bytes.
int zkh_pairing_check(const uint8_t *g1s, const uint8_t *g2s, size_t n) {
  std::vector<G1Affine> ps(n);
  std::vector<G2Affine> qs(n);
  for (size_t i = 0; i < n; ++i) {
    if (!read_g1(g1s + 65 * i, &ps[i])) return -1;
    if (!read_g2(g2s + 129 * i, &qs[i])) return -1;
    if (!g1_on_curve(ps[i]) || !g2_on_curve(qs[i])) return -1;
  }
  return pairing_product_is_one(ps.data(), qs.data(), (int)n) ? 1 : 0;
}

// Groth16 verify with the exact acceptance semantics of TxVerifier.sol:
// 258-296 (vk_x = IC_0 + sum input_i * IC_{i+1}; 4-term pairing product;
// coordinate range + on-curve validation like the EVM precompiles).
//   vk     = alpha1(65) | beta2(129) | gamma2(129) | delta2(129) | IC(n_ic*65)
//   proof  = a(65) | b(129) | c(65)
//   inputs = n_pub * 32 (reduced mod r internally)
int zkh_groth16_verify(const uint8_t *vk, size_t n_ic, const uint8_t *proof,
                       const uint8_t *inputs, size_t n_pub) {
  if (n_pub + 1 != n_ic) return -1;
  G1Affine alpha, pa, pc;
  G2Affine beta, gamma, delta, pb;
  if (!read_g1(vk, &alpha)) return -1;
  if (!read_g2(vk + 65, &beta)) return -1;
  if (!read_g2(vk + 65 + 129, &gamma)) return -1;
  if (!read_g2(vk + 65 + 258, &delta)) return -1;
  const uint8_t *ic = vk + 65 + 387;

  if (!read_g1(proof, &pa) || !read_g2(proof + 65, &pb) ||
      !read_g1(proof + 65 + 129, &pc))
    return -1;
  if (!g1_on_curve(pa) || !g2_on_curve(pb) || !g1_on_curve(pc)) return 0;
  if (pa.inf || pb.inf || pc.inf) return 0;

  // vk_x = IC_0 + sum s_i * IC_{i+1}
  G1Affine ic0;
  if (!read_g1(ic, &ic0)) return -1;
  G1 vk_x = G1::from_affine(ic0);
  for (size_t i = 0; i < n_pub; ++i) {
    G1Affine pt;
    if (!read_g1(ic + 65 * (i + 1), &pt)) return -1;
    // reduce the input mod r (the Solidity verifier requires input < r and
    // snarkjs reduces before formatting — common.ts:49)
    Fr s = Fr::from_std(u256_from_bytes(inputs + 32 * i));
    U256 k = s.to_std();
    vk_x = G1::add(vk_x, G1::mul(G1::from_affine(pt), k.v, 4));
  }

  G1Affine neg_a = {pa.x, Fq::neg(pa.y), pa.inf};
  G1Affine ps[4] = {neg_a, alpha, vk_x.to_affine(), pc};
  G2Affine qs[4] = {pb, beta, gamma, delta};
  return pairing_product_is_one(ps, qs, 4) ? 1 : 0;
}

// single pairing e(P, Q) -> 12 * 32 bytes (Fq12 coefficients, standard form,
// order c0.c0.c0, c0.c0.c1, c0.c1.c0, ... c1.c2.c1) — for tests
void zkh_pairing(const uint8_t *g1, const uint8_t *g2, uint8_t *out384) {
  G1Affine p;
  G2Affine q;
  if (!read_g1(g1, &p) || !read_g2(g2, &q)) {
    std::memset(out384, 0, 384);
    return;
  }
  Fq12 f = final_exponentiation(miller_loop(p, q));
  const Fq2 *cs[6] = {&f.c0.c0, &f.c0.c1, &f.c0.c2,
                      &f.c1.c0, &f.c1.c1, &f.c1.c2};
  for (int i = 0; i < 6; ++i) {
    u256_to_bytes(cs[i]->c0.to_std(), out384 + 64 * i);
    u256_to_bytes(cs[i]->c1.to_std(), out384 + 64 * i + 32);
  }
}

// ---------------------------------------------------------------------------
// BabyJubJub
// ---------------------------------------------------------------------------

int zkh_bjj_on_curve(const uint8_t *p) {
  return bjj_on_curve(fr_read(p), fr_read(p + 32)) ? 1 : 0;
}

int zkh_bjj_add(const uint8_t *pa, const uint8_t *pb, uint8_t *out) {
  BjjPoint a = BjjPoint::from_affine(fr_read(pa), fr_read(pa + 32));
  BjjPoint b = BjjPoint::from_affine(fr_read(pb), fr_read(pb + 32));
  Fr x, y;
  BjjPoint::add(a, b).to_affine(x, y);
  fr_write(x, out);
  fr_write(y, out + 32);
  return 1;
}

// raw-scalar mul (no reduction), scalar little-endian k_len bytes
int zkh_bjj_mul(const uint8_t *p, const uint8_t *k, size_t k_len,
                uint8_t *out) {
  BjjPoint a = BjjPoint::from_affine(fr_read(p), fr_read(p + 32));
  auto w = scalar_words(k, k_len);
  Fr x, y;
  BjjPoint::mul(a, w.data(), (int)w.size()).to_affine(x, y);
  fr_write(x, out);
  fr_write(y, out + 32);
  return 1;
}

// ---------------------------------------------------------------------------
// Host Groth16 prover core (prover.h): NTT, quotient, Pippenger MSM,
// fixed-base setup tables. "mont" entry points exchange RAW Montgomery-form
// 32-byte LE residues (zero-conversion interop with the 16x16-limb packed
// tables in zkrollup/groth16/keys.py: uint32->uint16 narrowing IS this
// byte layout).
// ---------------------------------------------------------------------------

namespace {

G1Affine g1_raw_mont(const uint8_t *x, const uint8_t *y, uint8_t inf) {
  if (inf) return {Fq::zero(), Fq::zero(), true};
  G1Affine p;
  std::memcpy(p.x.m.v, x, 32);
  std::memcpy(p.y.m.v, y, 32);
  p.inf = false;
  return p;
}

}  // namespace

// in-place NTT/iNTT over n standard-form Fr elements (n a power of two)
void zkh_fr_ntt(uint8_t *data, size_t n, int inverse) {
  std::vector<Fr> a(n);
  for (size_t i = 0; i < n; ++i) a[i] = fr_read(data + 32 * i);
  prover::fr_ntt(a.data(), n, inverse != 0);
  for (size_t i = 0; i < n; ++i) fr_write(a[i], data + 32 * i);
}

// COO A/B/C evaluation + quotient h = (A*B - C)/Z on the coset.
// coeff buffers are RAW MONTGOMERY form; witness and h are standard form.
void zkh_groth16_quotient(
    const uint32_t *a_row, const uint32_t *a_var, const uint8_t *a_coeff,
    size_t a_nnz, const uint32_t *b_row, const uint32_t *b_var,
    const uint8_t *b_coeff, size_t b_nnz, const uint32_t *c_row,
    const uint32_t *c_var, const uint8_t *c_coeff, size_t c_nnz,
    const uint8_t *witness, size_t nv, size_t m, uint8_t *h_out) {
  std::vector<Fr> w(nv);
  for (size_t i = 0; i < nv; ++i) w[i] = fr_read(witness + 32 * i);
  std::vector<Fr> A(m), B(m), C(m), H(m);
  std::thread ta([&] {
    prover::spmv({a_row, a_var, a_coeff, a_nnz}, w.data(), m, A.data());
  });
  std::thread tb([&] {
    prover::spmv({b_row, b_var, b_coeff, b_nnz}, w.data(), m, B.data());
  });
  prover::spmv({c_row, c_var, c_coeff, c_nnz}, w.data(), m, C.data());
  ta.join();
  tb.join();
  prover::quotient_from_evals(A.data(), B.data(), C.data(), m, H.data());
  for (size_t i = 0; i < m; ++i) fr_write(H[i], h_out + 32 * i);
}

// Pippenger G1 MSM over a raw-mont table; scalars standard form; c <= 0
// picks the window from the size. Output: 65-byte standard affine.
int zkh_g1_msm_pip(const uint8_t *xs, const uint8_t *ys, const uint8_t *infs,
                   const uint8_t *scalars, size_t n, int c, uint8_t *out) {
  std::vector<G1Affine> pts(n);
  for (size_t i = 0; i < n; ++i)
    pts[i] = g1_raw_mont(xs + 32 * i, ys + 32 * i, infs[i]);
  G1 r = prover::msm_pippenger<G1, G1Affine>(pts.data(), scalars, n, c);
  write_g1(r.to_affine(), out);
  return 1;
}

int zkh_g2_msm_pip(const uint8_t *xs0, const uint8_t *xs1, const uint8_t *ys0,
                   const uint8_t *ys1, const uint8_t *infs,
                   const uint8_t *scalars, size_t n, int c, uint8_t *out) {
  std::vector<G2Affine> pts(n);
  for (size_t i = 0; i < n; ++i) {
    if (infs[i]) {
      pts[i] = {Fq2::zero(), Fq2::zero(), true};
      continue;
    }
    G2Affine p;
    std::memcpy(p.x.c0.m.v, xs0 + 32 * i, 32);
    std::memcpy(p.x.c1.m.v, xs1 + 32 * i, 32);
    std::memcpy(p.y.c0.m.v, ys0 + 32 * i, 32);
    std::memcpy(p.y.c1.m.v, ys1 + 32 * i, 32);
    p.inf = false;
    pts[i] = p;
  }
  G2 r = prover::msm_pippenger<G2, G2Affine>(pts.data(), scalars, n, c);
  write_g2(r.to_affine(), out);
  return 1;
}

namespace {

constexpr u64 G2X0[4] = {0x46debd5cd992f6edull, 0x674322d4f75edaddull,
                         0x426a00665e5c4479ull, 0x1800deef121f1e76ull};
constexpr u64 G2X1[4] = {0x97e485b7aef312c2ull, 0xf1aa493335a9e712ull,
                         0x7260bfb731fb5d25ull, 0x198e9393920d483aull};
constexpr u64 G2Y0[4] = {0x4ce6cc0166fa7daaull, 0xe3d1e7690c43d37bull,
                         0x4aab71808dcb408full, 0x12c85ea5db8c6debull};
constexpr u64 G2Y1[4] = {0x55acdadcd122975bull, 0xbc4b313370b38ef3ull,
                         0xec9e99ad690c3395ull, 0x090689d0585ff075ull};

const prover::FixedBaseTable<G1, G1Affine> &g1_gen_table() {
  static prover::FixedBaseTable<G1, G1Affine> tbl(G1::from_affine(
      {Fq::from_std(U256{{1, 0, 0, 0}}), Fq::from_std(U256{{2, 0, 0, 0}}),
       false}));
  return tbl;
}

const prover::FixedBaseTable<G2, G2Affine> &g2_gen_table() {
  static prover::FixedBaseTable<G2, G2Affine> tbl(G2::from_affine(
      {{Fq::from_std(U256{{G2X0[0], G2X0[1], G2X0[2], G2X0[3]}}),
        Fq::from_std(U256{{G2X1[0], G2X1[1], G2X1[2], G2X1[3]}})},
       {Fq::from_std(U256{{G2Y0[0], G2Y0[1], G2Y0[2], G2Y0[3]}}),
        Fq::from_std(U256{{G2Y1[0], G2Y1[1], G2Y1[2], G2Y1[3]}})},
       false}));
  return tbl;
}

}  // namespace

// out[i] = scalars[i] * G1_GEN, raw-mont coordinate planes + inf bytes
// (the packed-table layout groth16/setup.py builds)
void zkh_g1_fixed_base_mont(const uint8_t *scalars, size_t n, uint8_t *xs,
                            uint8_t *ys, uint8_t *infs) {
  std::vector<G1Affine> out(n);
  prover::fixed_base_many(g1_gen_table(), scalars, n, out.data());
  for (size_t i = 0; i < n; ++i) {
    infs[i] = out[i].inf ? 1 : 0;
    std::memcpy(xs + 32 * i, out[i].x.m.v, 32);
    std::memcpy(ys + 32 * i, out[i].y.m.v, 32);
  }
}

void zkh_g2_fixed_base_mont(const uint8_t *scalars, size_t n, uint8_t *xs0,
                            uint8_t *xs1, uint8_t *ys0, uint8_t *ys1,
                            uint8_t *infs) {
  std::vector<G2Affine> out(n);
  prover::fixed_base_many(g2_gen_table(), scalars, n, out.data());
  for (size_t i = 0; i < n; ++i) {
    infs[i] = out[i].inf ? 1 : 0;
    std::memcpy(xs0 + 32 * i, out[i].x.c0.m.v, 32);
    std::memcpy(xs1 + 32 * i, out[i].x.c1.m.v, 32);
    std::memcpy(ys0 + 32 * i, out[i].y.c0.m.v, 32);
    std::memcpy(ys1 + 32 * i, out[i].y.c1.m.v, 32);
  }
}

}  // extern "C"
