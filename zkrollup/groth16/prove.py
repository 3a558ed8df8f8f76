"""Groth16 prover — the TPU pipeline.

This is the rebuild of websnark's `groth16GenProof` inner loop
(/root/reference/operator/src/snarks/common.ts:29; SURVEY §3.3 "HOTTEST"):

  1. sparse A/B/C evaluation over the domain   -> batched COO mat-vec
     (gather + Montgomery mul + lazy-carry segment-sum, all VPU)
  2. quotient polynomial h = (A*B - C)/Z        -> iNTT + coset NTT kernels
     (Z is constant on the coset g*H, so the division is one scalar mul)
  3. pi_A / pi_B / pi_B1 / pi_C / h MSMs        -> Pippenger kernels over the
     packed key tables (msm/msm.py), G1 and G2
  4. blinding combine (r, s)                    -> a handful of host point ops

Deterministic mode: pass r and s explicitly — same inputs, same key => same
proof bytes (the distributed-prover determinism gate, SURVEY §5).
"""

from __future__ import annotations

import os
import secrets
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.mont import FR
from ..fields import limbs as L
from ..ntt.ntt import intt_mont, coset_ntt_mont, coset_intt_mont, COSET_SHIFT
from ..msm.msm import msm
from ..msm.glv import msm_glv
from ..curve import g1_jax, g2_jax
from ..ref import bn254 as ref
from ..ref.bn254 import R as FR_MOD
from .keys import ProvingKey, Proof
from .qap import to_coo

# Pippenger window. 10 is the TPU sweet spot at production sizes; the env
# override exists because compile time scales with the window (the bucket
# scan unrolls ~3c add bodies) — tests/conftest.py sets a small window so
# CPU test compiles stay fast. Results are identical for any window.
# CONTRACT: read ONCE at import (the module-level _msm_g1/_msm_g2 jits bake
# it into their compiled programs) — set ZKROLLUP_MSM_WINDOW before
# importing zkrollup, not after.
MSM_WINDOW = int(os.environ.get("ZKROLLUP_MSM_WINDOW", "10"))


# -- sparse matrix-vector product over the domain -----------------------------

def _spmv(row, var, coeff_mont, w_mont, m: int):
    """eval[j] = sum_{k in row j} coeff_k * w[var_k]  (mod r), Montgomery.

    Terms are Montgomery products (canonical, < 2^16 per limb); the per-row
    sum uses per-limb uint32 lazy accumulation (segment_sum), then one carry
    pass and a 2-mont_mul fold reduces the <= 2^272-bit lazy value mod r:
    V = lo + hi*2^256  =>  V mod r = lo*R*R^-1 + hi*R^2*R^-1 = mont(lo, one)
    + mont(hi, R^2)."""
    terms = FR.mont_mul(coeff_mont, w_mont[var])          # (nnz, 16)
    sums = jax.ops.segment_sum(terms, row, num_segments=m)  # lazy limbs
    ext = jnp.concatenate(
        [sums, jnp.zeros((m, 2), jnp.uint32)], axis=-1)
    ext = L.propagate_carries(ext)
    lo = ext[:, :L.N_LIMBS]
    hi = jnp.concatenate(
        [ext[:, L.N_LIMBS:], jnp.zeros((m, L.N_LIMBS - 2), jnp.uint32)],
        axis=-1)
    # lo < 2^256: mont(lo, R mod p) = lo*R*R^-1 = lo (mod p);
    # hi < 2^32:  mont(hi, R^2)     = hi*R = hi*2^256 (mod p)
    return FR.add(FR.mont_mul(lo, FR.one_mont), FR.mont_mul(hi, FR.r2_limbs))


@partial(jax.jit, static_argnames=("m",))
def _abc_evals(coo_arrays, w_mont, m: int):
    (ar, av, ac), (br, bv, bc), (cr, cv, cc) = coo_arrays
    with jax.named_scope("groth16.spmv_abc"):
        return (_spmv(ar, av, ac, w_mont, m),
                _spmv(br, bv, bc, w_mont, m),
                _spmv(cr, cv, cc, w_mont, m))


@jax.jit
def _quotient_plain(a_e, b_e, c_e, zinv_mont):
    """Domain evaluations (mont) -> h coefficients in PLAIN form (MSM
    scalar layout). Z(g*w^i) = g^m - 1 is constant on the coset.
    named_scope markers land in jax.profiler traces (tools/trace_prove.py
    — the tracing obligation of SURVEY §5)."""
    with jax.named_scope("groth16.quotient"):
        pa = intt_mont(a_e)
        pb = intt_mont(b_e)
        pc = intt_mont(c_e)
        ca = coset_ntt_mont(pa)
        cb = coset_ntt_mont(pb)
        cc = coset_ntt_mont(pc)
        h_cos = FR.mont_mul(FR.sub(FR.mont_mul(ca, cb), cc), zinv_mont)
        h = coset_intt_mont(h_cos)
        return FR.from_mont(h)


def _scoped_msm(curve, name):
    def run(pts, sc):
        with jax.named_scope(name):
            return msm(curve, pts, sc, c=MSM_WINDOW)
    return jax.jit(run)


def _msm_g1(pts, sc):
    # device window sums + HOST Horner combine: the on-device combine is
    # ~290 batch-1 kernels (~0.3s pure dispatch at prove sizes, chip-
    # measured); host combine is <30ms of python-int point ops
    from ..msm.msm import msm_host_combine
    return msm_host_combine(g1_jax.G1, pts, sc, c=MSM_WINDOW)


_msm_g2 = _scoped_msm(g2_jax.G2, "groth16.msm_g2")


def _g1_result(jac) -> Optional[tuple]:
    pt = g1_jax.to_affine_host(
        tuple(np.asarray(c).reshape(1, L.N_LIMBS) for c in jac))
    return pt[0]


def _g2_result(jac) -> Optional[tuple]:
    rs = lambda c: (np.asarray(c[0]).reshape(1, L.N_LIMBS),
                    np.asarray(c[1]).reshape(1, L.N_LIMBS))
    return g2_jax.to_affine_host(tuple(rs(c) for c in jac))[0]


def _blind_combine(pk: ProvingKey, pi_a_msm, pi_b_msm, pi_b1_msm, pi_c_msm,
                   pi_h_msm, r: int, s: int) -> Proof:
    """Stage 4: blinding combine (host single-point ops)."""
    g1a, g1m = ref.g1_add, ref.g1_mul
    pi_a = g1a(g1a(pk.alpha1, pi_a_msm), g1m(pk.delta1, r))
    pi_b = ref.g2_add(ref.g2_add(pk.beta2, pi_b_msm),
                      ref.g2_mul(pk.delta2, s))
    pi_b1 = g1a(g1a(pk.beta1, pi_b1_msm), g1m(pk.delta1, s))
    pi_c = g1a(g1a(pi_c_msm, pi_h_msm),
               g1a(g1a(g1m(pi_a, s), g1m(pi_b1, r)),
                   g1m(pk.delta1, (-r * s) % FR_MOD)))
    return Proof(a=pi_a, b=pi_b, c=pi_c)


def _prove_host(pk: ProvingKey, coo, witness: List[int], r: int,
                s: int) -> Proof:
    """The CPU-backend prove path: COO quotient + 5 Pippenger MSMs in the
    native C++ engine (the role websnark's WASM prover plays for the
    reference's Node operator). Bit-identical to the device path with
    pinned (r, s) — differentially tested in tests/test_groth16.py."""
    from ..native import engine
    m = coo.m
    w_bytes = engine.ints_to_fr_bytes(witness)
    h_bytes = engine.groth16_quotient(coo, w_bytes, pk.n_vars, m)

    tbl = getattr(pk, "_host_tables", None)
    if tbl is None:
        tbl = {
            "a": (engine.pack_g1_table_mont(pk.a_g1), pk.n_vars),
            "b1": (engine.pack_g1_table_mont(pk.b1_g1), pk.n_vars),
            "c": (engine.pack_g1_table_mont(pk.c_g1),
                  pk.n_vars - pk.n_public),
            "h": (engine.pack_g1_table_mont(pk.h_g1), m - 1),
            "b2": (engine.pack_g2_table_mont(pk.b2_g2), pk.n_vars),
        }
        object.__setattr__(pk, "_host_tables", tbl)

    pi_a = engine.g1_msm_pip(tbl["a"][0], w_bytes, tbl["a"][1])
    pi_b1 = engine.g1_msm_pip(tbl["b1"][0], w_bytes, tbl["b1"][1])
    pi_c = engine.g1_msm_pip(tbl["c"][0], w_bytes[32 * pk.n_public:],
                             tbl["c"][1])
    pi_h = engine.g1_msm_pip(tbl["h"][0], h_bytes[:32 * (m - 1)],
                             tbl["h"][1])
    pi_b = engine.g2_msm_pip(tbl["b2"][0], w_bytes, tbl["b2"][1])
    return _blind_combine(pk, pi_a, pi_b, pi_b1, pi_c, pi_h, r, s)


def _pad_rows(a: np.ndarray, n: int) -> np.ndarray:
    if a.shape[0] >= n:
        return a
    pad = np.zeros((n - a.shape[0],) + a.shape[1:], a.dtype)
    return np.concatenate([a, pad], axis=0)


def _dist_tables(pk: ProvingKey, d: int):
    """Pad every G1 key table (and B2) to ONE uniform size divisible by the
    mesh so all four sharded G1 MSMs share a single compiled program
    (infinity points + zero scalars are no-ops). Cached per (pk, d)."""
    cache = getattr(pk, "_dist_tables", {})
    if d in cache:
        return cache[d]
    m = pk.domain_size
    # round up to a multiple of d: the sharded MSM reshapes each table to
    # (d, pad_to/d) blocks, so pad_to must divide evenly even when the NTT
    # domain m is not a multiple of the mesh size (e.g. a 6-device mesh)
    pad_to = -(-max(m, pk.n_vars) // d) * d

    def pad_inf(inf):
        inf = np.asarray(inf)
        if inf.shape[0] < pad_to:  # padding rows are the point at infinity
            inf = np.concatenate(
                [inf, np.ones((pad_to - inf.shape[0], 1), inf.dtype)],
                axis=0)
        return jnp.asarray(inf)

    def pad_g1(tbl):
        x, y, inf = tbl
        return (jnp.asarray(_pad_rows(np.asarray(x), pad_to)),
                jnp.asarray(_pad_rows(np.asarray(y), pad_to)),
                pad_inf(inf))

    (bx0, bx1), (by0, by1), binf = pk.b2_g2
    b2 = ((jnp.asarray(_pad_rows(np.asarray(bx0), pad_to)),
           jnp.asarray(_pad_rows(np.asarray(bx1), pad_to))),
          (jnp.asarray(_pad_rows(np.asarray(by0), pad_to)),
           jnp.asarray(_pad_rows(np.asarray(by1), pad_to))),
          pad_inf(binf))
    tables = {
        "pad_to": pad_to,
        "a": pad_g1(pk.a_g1),
        "b1": pad_g1(pk.b1_g1),
        "c": pad_g1(pk.c_g1),
        "h": pad_g1(pk.h_g1),
        "b2": b2,
    }
    cache[d] = tables
    object.__setattr__(pk, "_dist_tables", cache)
    return tables


def _prove_distributed(pk: ProvingKey, coo, witness: List[int], r: int,
                       s: int, mesh, c: Optional[int] = None,
                       table_groups: int = 1) -> Proof:
    """Multi-chip prove: sharded four-step quotient + the five sharded
    MSMs (dist/mesh.py distributed_prove_core) — SP over the NTT domain,
    DP/TP over the MSM tables. Bit-identical to the single-chip path with
    pinned (r, s) (tests/test_dist.py)."""
    from ..dist import mesh as dmesh
    d = int(mesh.devices.size)
    m = coo.m
    log_m = m.bit_length() - 1
    c_eff = c if c is not None else min(MSM_WINDOW, 8)

    w_plain_np = L.ints_to_limbs([w % FR_MOD for w in witness])
    w_plain = jnp.asarray(w_plain_np)
    w_mont = FR.to_mont(w_plain)
    coo_dev = ((jnp.asarray(coo.a_row), jnp.asarray(coo.a_var),
                jnp.asarray(coo.a_coeff)),
               (jnp.asarray(coo.b_row), jnp.asarray(coo.b_var),
                jnp.asarray(coo.b_coeff)),
               (jnp.asarray(coo.c_row), jnp.asarray(coo.c_var),
                jnp.asarray(coo.c_coeff)))
    a_e, b_e, c_e = _abc_evals(coo_dev, w_mont, m)
    z_coset = (pow(COSET_SHIFT, m, FR_MOD) - 1) % FR_MOD
    zinv_mont = FR.const_mont(pow(z_coset, FR_MOD - 2, FR_MOD))

    tbl = _dist_tables(pk, d)
    pad_to = tbl["pad_to"]
    w_sc = jnp.asarray(_pad_rows(w_plain_np, pad_to))
    c_sc = jnp.asarray(_pad_rows(w_plain_np[pk.n_public:], pad_to))

    _h, results = dmesh.distributed_prove_core(
        mesh,
        dmesh.cyclic_shard(a_e, d), dmesh.cyclic_shard(b_e, d),
        dmesh.cyclic_shard(c_e, d), zinv_mont, log_m,
        g1_tables={"a": (tbl["a"], w_sc), "b1": (tbl["b1"], w_sc),
                   "c": (tbl["c"], c_sc), "h": (tbl["h"], None)},
        g2_table=(tbl["b2"], w_sc), c=c_eff, table_groups=table_groups)

    return _blind_combine(
        pk, _g1_result(results["a"]), _g2_result(results["b2"]),
        _g1_result(results["b1"]), _g1_result(results["c"]),
        _g1_result(results["h"]), r, s)


def prove(pk: ProvingKey, r1cs, witness: List[int],
          r: Optional[int] = None, s: Optional[int] = None,
          backend: Optional[str] = None, mesh=None,
          table_groups: int = 1) -> Proof:
    """Generate a Groth16 proof for `witness` (full assignment, var 0 = 1).

    backend: "device" (JAX/TPU pipeline), "host" (native C++ engine), or
    None/"auto" — device when a real accelerator is attached, host when
    running on the CPU backend with libzkhost built (the websnark-analog
    fallback; ~50x faster than XLA:CPU on the 16-limb kernels).

    mesh: a jax.sharding.Mesh routes the quotient + all five MSMs through
    the distributed pipeline (dist/mesh.py) — the multi-chip path.
    table_groups > 1 additionally schedules the five MSM tables onto
    disjoint chip groups (the EP/PP axis); proof is identical."""
    if r1cs.n_vars != pk.n_vars or r1cs.n_public != pk.n_public:
        raise ValueError("proving key does not match this constraint system")
    if r is None:
        r = secrets.randbelow(FR_MOD)
    if s is None:
        s = secrets.randbelow(FR_MOD)

    coo = to_coo(r1cs)
    if mesh is not None:
        assert coo.m == pk.domain_size, "key/domain mismatch"
        return _prove_distributed(pk, coo, [w % FR_MOD for w in witness],
                                  r, s, mesh, table_groups=table_groups)
    if backend is None:
        backend = os.environ.get("ZKROLLUP_PROVE_BACKEND", "auto")
    if backend == "auto":
        from ..native import engine
        backend = ("host" if jax.default_backend() == "cpu"
                   and engine.available() else "device")
    if backend == "host":
        from ..native import engine
        if not engine.available():
            raise RuntimeError("host backend requested but libzkhost "
                               "is not built (make -C native)")
        witness = [w % FR_MOD for w in witness]
        assert coo.m == pk.domain_size, "key/domain mismatch"
        return _prove_host(pk, coo, witness, r, s)
    m = coo.m
    assert m == pk.domain_size, "key/domain mismatch"

    w_plain = jnp.asarray(L.ints_to_limbs([w % FR_MOD for w in witness]))
    w_mont = FR.to_mont(w_plain)

    # 1-2: evaluations + quotient polynomial
    coo_dev = ((jnp.asarray(coo.a_row), jnp.asarray(coo.a_var),
                jnp.asarray(coo.a_coeff)),
               (jnp.asarray(coo.b_row), jnp.asarray(coo.b_var),
                jnp.asarray(coo.b_coeff)),
               (jnp.asarray(coo.c_row), jnp.asarray(coo.c_var),
                jnp.asarray(coo.c_coeff)))
    a_e, b_e, c_e = _abc_evals(coo_dev, w_mont, m)
    z_coset = (pow(COSET_SHIFT, m, FR_MOD) - 1) % FR_MOD
    zinv_mont = FR.const_mont(pow(z_coset, FR_MOD - 2, FR_MOD))
    h_plain = _quotient_plain(a_e, b_e, c_e, zinv_mont)  # (m, 16)

    # 3: the five multiexponentiations. Plain 256-bit Pippenger by default:
    # chip-measured FASTER than GLV on the sort-based run-merge design
    # (bucket adds are W*n either way, so halved windows buy only the small
    # reduction scan while paying host decompose + double-width gathers —
    # 80.7k vs 69.1k pts/s at 2^17/c=10, round-4 bench matrix).
    # ZKROLLUP_PROVE_GLV=1 re-enables the endomorphism path.
    use_glv = os.environ.get("ZKROLLUP_PROVE_GLV", "0") == "1"
    w_np = np.asarray(w_plain)
    h_np = np.asarray(h_plain)[:m - 1]
    if use_glv:
        pi_a_msm = _g1_result(msm_glv(pk.a_g1, w_np, c=MSM_WINDOW))
        pi_b1_msm = _g1_result(msm_glv(pk.b1_g1, w_np, c=MSM_WINDOW))
        pi_c_msm = _g1_result(msm_glv(pk.c_g1, w_np[pk.n_public:],
                                      c=MSM_WINDOW))
        pi_h_msm = _g1_result(msm_glv(pk.h_g1, h_np, c=MSM_WINDOW))
    else:
        # key tables staged to device ONCE per key (tens of MB each — the
        # H2D transfer is per-proof overhead otherwise)
        dev = getattr(pk, "_dev_g1", None)
        if dev is None:
            as_dev = lambda t: tuple(jnp.asarray(a) for a in t)
            dev = {"a": as_dev(pk.a_g1), "b1": as_dev(pk.b1_g1),
                   "c": as_dev(pk.c_g1), "h": as_dev(pk.h_g1)}
            object.__setattr__(pk, "_dev_g1", dev)
        pi_a_msm = _g1_result(_msm_g1(dev["a"], jnp.asarray(w_np)))
        pi_b1_msm = _g1_result(_msm_g1(dev["b1"], jnp.asarray(w_np)))
        pi_c_msm = _g1_result(_msm_g1(dev["c"],
                                      jnp.asarray(w_np[pk.n_public:])))
        pi_h_msm = _g1_result(_msm_g1(dev["h"], jnp.asarray(h_np)))
    # The single G2 MSM runs on the HOST engine when built: the Fq2 scan
    # graph is compile-pathological on TPU (27 min at prove shapes, chip-
    # measured) while the threaded native Pippenger does it in seconds;
    # G1 — the bulk of the work — stays on device. Device fallback kept
    # for environments without libzkhost.
    from ..native import engine
    if engine.available():
        tbl = getattr(pk, "_host_b2", None)
        if tbl is None:
            tbl = engine.pack_g2_table_mont(pk.b2_g2)
            object.__setattr__(pk, "_host_b2", tbl)
        pi_b_msm = engine.g2_msm_pip(
            tbl, engine.ints_to_fr_bytes(witness), pk.n_vars)
    else:
        (bx0, bx1), (by0, by1), binf = pk.b2_g2
        b2_dev = ((jnp.asarray(bx0), jnp.asarray(bx1)),
                  (jnp.asarray(by0), jnp.asarray(by1)), jnp.asarray(binf))
        pi_b_msm = _g2_result(_msm_g2(b2_dev, w_plain))

    return _blind_combine(pk, pi_a_msm, pi_b_msm, pi_b1_msm, pi_c_msm,
                          pi_h_msm, r, s)
