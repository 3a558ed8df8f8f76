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
from ..msm.msm import msm, pack_tables, msm_multi_host_combine
from ..msm.glv import (msm_glv, combine_window_sums_host_g2,
                       combine_multi_window_sums_host)
from ..curve import g1_jax, g2_jax
from ..ref import bn254 as ref
from ..ref.bn254 import R as FR_MOD
from .keys import ProvingKey, Proof
from .qap import to_coo

# Pippenger window. 12 is the TPU sweet spot at production sizes (r5
# matrix: c=10 and c=12 within noise on the fused program; c=12 wins the
# single-table bench); tests/conftest.py sets a small window so CPU test
# compiles stay fast. Results are identical for any window.
# CONTRACT: read ONCE at import (jit caches bake it into their compiled
# programs) — set ZKROLLUP_MSM_WINDOW before importing zkrollup, not after.
MSM_WINDOW = int(os.environ.get("ZKROLLUP_MSM_WINDOW", "12"))

_to_mont_jit = jax.jit(lambda a: FR.to_mont(a))


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


def _filt_dedup(x, y, inf, scalar_idx):
    """Drop infinity rows AND merge DUPLICATE points, mapping each source
    row to its (unique-point, position) so per-proof scalars of merged
    rows are segment-summed on device.

    Real key tables contain systematically duplicated points: every
    variable that appears in exactly one A-row with the same coefficient
    set shares A_i(tau) with its row-mates (e.g. the materialize rows'
    -1 coefficients), and squaring constraints give a var identical A and
    B1 columns — 1020 duplicates in the (2,6) a-table alone. The scan
    MSM's no-double-path kernels require pairwise-distinct points WITHIN
    a table (adjacent equal points at a chunk restart are a true double —
    caught as an invalid device proof, round 5), and merging is also
    strictly less work: sum w_u P + w_v P = (w_u + w_v) P."""
    keep = np.where(inf[:, 0] == 0)[0].astype(np.int32)
    xy = np.concatenate([c[keep] for c in (x, y)], axis=1)
    uxy, first, inv = np.unique(xy, axis=0, return_index=True,
                                return_inverse=True)
    n_u = uxy.shape[0]
    kx, ky = x[keep][first], y[keep][first]
    kinf = inf[keep][first]
    return ((kx, ky, kinf),
            scalar_idx[keep].astype(np.int32),       # source scalar gather
            inv.astype(np.int32), n_u)               # merge map


def _device_pack_g1(pk: ProvingKey):
    """Stage the four G1 key tables as ONE packed multi-table MSM problem
    (VERDICT r4 #1): infinity rows dropped (vars absent from A/B leave
    A_i(tau) = 0 — ~5-40% of each table), duplicate points merged
    (_filt_dedup), tables concatenated and padded to a CHUNK multiple,
    index/merge maps kept so per-proof scalars are one device gather +
    segment-sum. Cached on the key; points live in HBM across proofs."""
    pack = getattr(pk, "_msm_pack_g1", None)
    if pack is not None:
        return pack

    def prep(tbl, scalar_idx):
        x, y, inf = (np.asarray(t) for t in tbl)
        return _filt_dedup(x, y, inf, scalar_idx)

    nv, npub = pk.n_vars, pk.n_public
    m = pk.domain_size
    a = prep(pk.a_g1, np.arange(nv))
    b1 = prep(pk.b1_g1, np.arange(nv))
    c = prep(pk.c_g1, np.arange(npub, nv))
    h = prep(pk.h_g1, np.arange(m - 1))
    points, bounds = pack_tables([t[0] for t in (a, b1, c, h)])
    pack = {
        "points": points, "bounds": tuple(bounds),
        "idx": tuple(jnp.asarray(t[1]) for t in (a, b1, c, h)),
        "seg": tuple(jnp.asarray(t[2]) for t in (a, b1, c, h)),
        "n_seg": tuple(int(t[3]) for t in (a, b1, c, h)),
        "N": int(points[0].shape[0]),
    }
    object.__setattr__(pk, "_msm_pack_g1", pack)
    return pack


def _device_pack_g2(pk: ProvingKey):
    """Filtered + deduplicated b2 table: only vars appearing in B have
    non-infinity points (~60-65% at the production circuit); duplicate
    twist points merged like the G1 tables (_filt_dedup)."""
    pack = getattr(pk, "_msm_pack_g2", None)
    if pack is not None:
        return pack
    (x0, x1), (y0, y1), inf = (pk.b2_g2[0], pk.b2_g2[1], pk.b2_g2[2])
    x0, x1, y0, y1, inf = (np.asarray(t) for t in (x0, x1, y0, y1, inf))
    keep = np.where(inf[:, 0] == 0)[0].astype(np.int32)
    xy = np.concatenate([c[keep] for c in (x0, x1, y0, y1)], axis=1)
    uxy, first, inv = np.unique(xy, axis=0, return_index=True,
                                return_inverse=True)
    sel = keep[first]
    pts = ((jnp.asarray(x0[sel]), jnp.asarray(x1[sel])),
           (jnp.asarray(y0[sel]), jnp.asarray(y1[sel])),
           jnp.asarray(inf[sel]))
    pack = {"points": pts, "idx": jnp.asarray(keep),
            "seg": jnp.asarray(inv.astype(np.int32)),
            "n_seg": int(uxy.shape[0])}
    object.__setattr__(pk, "_msm_pack_g2", pack)
    return pack


def _segsum_scalars(scalars, seg, n_seg: int):
    """Sum scalar groups of merged duplicate points, mod r. Lazy per-limb
    uint32 accumulation (group sums < 2^18 * r < 2^272) folded back mod r
    with the same two-mont trick _spmv uses; the result is a valid plain
    scalar for digit decomposition (the MSM consumes scalars mod r —
    point order r)."""
    sums = jax.ops.segment_sum(scalars, seg, num_segments=n_seg)
    ext = jnp.concatenate(
        [sums, jnp.zeros((n_seg, 2), jnp.uint32)], axis=-1)
    ext = L.propagate_carries(ext)
    lo = ext[:, :L.N_LIMBS]
    hi = jnp.concatenate(
        [ext[:, L.N_LIMBS:], jnp.zeros((n_seg, L.N_LIMBS - 2), jnp.uint32)],
        axis=-1)
    return FR.add(FR.mont_mul(lo, FR.one_mont),
                  FR.mont_mul(hi, FR.r2_limbs))


@partial(jax.jit, static_argnames=("bounds", "n_total", "n_seg"))
def _scalars_cat(w_plain, h_plain, idx, seg, n_seg, bounds, n_total: int):
    """Gather + merge the per-table scalars into the packed column layout
    (zero scalars in the padding columns)."""
    srcs = (w_plain, w_plain, w_plain, h_plain)
    parts = [_segsum_scalars(s[idx[t]], seg[t], n_seg[t])
             for t, s in enumerate(srcs)]
    used = sum(l for _, l in bounds)
    if n_total > used:
        parts.append(jnp.zeros((n_total - used, L.N_LIMBS), jnp.uint32))
    return jnp.concatenate(parts, axis=0)


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
    # ONE compiled program: eager to_mont dispatches ~2k tiny ops over the
    # axon tunnel (~3.1s measured at (2,6) vs ~5ms jitted)
    w_mont = _to_mont_jit(w_plain)

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

    # 3: the five multiexponentiations. Default: the four G1 MSMs run as
    # ONE fused multi-table chunked-scan program (one sort, one scan,
    # shared reduction tails — msm.msm_multi_host_combine) over the
    # infinity-filtered packed key tables; distinct=True is sound because
    # key-table points are pairwise distinct (random tau powers).
    # ZKROLLUP_PROVE_GLV=1 re-enables the endomorphism path (slower on
    # the scan design — round-4 bench matrix).
    use_glv = os.environ.get("ZKROLLUP_PROVE_GLV", "0") == "1"
    g2_backend = os.environ.get("ZKROLLUP_G2_BACKEND", "device")
    from ..native import engine
    from ..msm.msm import _multi_window_sums_jit, _window_sums_jit, \
        _clamp_window

    if use_glv:
        # host-side copies only on the GLV path; on the default path they
        # would force a device sync mid-pipeline
        w_np = np.asarray(w_plain)
        h_np = np.asarray(h_plain)[:m - 1]
        pi_a_msm = _g1_result(msm_glv(pk.a_g1, w_np, c=MSM_WINDOW))
        pi_b1_msm = _g1_result(msm_glv(pk.b1_g1, w_np, c=MSM_WINDOW))
        pi_c_msm = _g1_result(msm_glv(pk.c_g1, w_np[pk.n_public:],
                                      c=MSM_WINDOW))
        pi_h_msm = _g1_result(msm_glv(pk.h_g1, h_np, c=MSM_WINDOW))
        wsum2 = None
    else:
        # DISPATCH both MSM programs before any host-side combine syncs:
        # the device queues G1 then G2 back-to-back, so the G2 MSM runs
        # while the host Horner-combines the G1 window sums.
        pack = _device_pack_g1(pk)
        sc_cat = _scalars_cat(w_plain, h_plain, pack["idx"], pack["seg"],
                              pack["n_seg"], pack["bounds"], pack["N"])
        c1 = _clamp_window(MSM_WINDOW, max(l for _, l in pack["bounds"]))
        with jax.named_scope("groth16.msm_g1"):
            wsum1, _ = _multi_window_sums_jit(g1_jax.G1)(
                tuple(pack["points"]), sc_cat, c=c1,
                bounds=pack["bounds"], distinct=True)

        wsum2 = None
        if not (g2_backend == "host" and engine.available()):
            g2p = _device_pack_g2(pk)
            sc2 = jax.jit(_segsum_scalars, static_argnames=("n_seg",))(
                w_plain[g2p["idx"]], g2p["seg"], n_seg=g2p["n_seg"])
            c2 = _clamp_window(min(MSM_WINDOW, 12), int(sc2.shape[0]))
            with jax.named_scope("groth16.msm_g2"):
                wsum2, _ = _window_sums_jit(g2_jax.G2)(
                    tuple(g2p["points"]), sc2, c=c2, n_bits=256,
                    distinct=True)

        # one device->host transfer for the whole (W, 4) window-sum block;
        # per-table device slicing costs ~40ms/dispatch on the axon tunnel
        pi_a_msm, pi_b1_msm, pi_c_msm, pi_h_msm = \
            combine_multi_window_sums_host(wsum1, c1)

    # The single G2 MSM: on-device via the same chunked scan through the
    # fused Fq2 Pallas kernels (pallas_curve_g2.py — the round-4 compile
    # pathology is gone because each unified add is ONE kernel). The host
    # C++ engine remains available as an explicit opt-in
    # (ZKROLLUP_G2_BACKEND=host) for overlap scheduling.
    if wsum2 is not None:
        pi_b_msm = combine_window_sums_host_g2(wsum2, c2)
    elif g2_backend == "host" and engine.available():
        tbl = getattr(pk, "_host_b2", None)
        if tbl is None:
            tbl = engine.pack_g2_table_mont(pk.b2_g2)
            object.__setattr__(pk, "_host_b2", tbl)
        pi_b_msm = engine.g2_msm_pip(
            tbl, engine.ints_to_fr_bytes(witness), pk.n_vars)
    else:
        # GLV path without host engine: device G2 via the packed table
        g2p = _device_pack_g2(pk)
        sc2 = jax.jit(_segsum_scalars, static_argnames=("n_seg",))(
            w_plain[g2p["idx"]], g2p["seg"], n_seg=g2p["n_seg"])
        c2 = _clamp_window(min(MSM_WINDOW, 12), int(sc2.shape[0]))
        wsum2, _ = _window_sums_jit(g2_jax.G2)(
            tuple(g2p["points"]), sc2, c=c2, n_bits=256, distinct=True)
        pi_b_msm = combine_window_sums_host_g2(wsum2, c2)

    return _blind_combine(pk, pi_a_msm, pi_b_msm, pi_b1_msm, pi_c_msm,
                          pi_h_msm, r, s)
