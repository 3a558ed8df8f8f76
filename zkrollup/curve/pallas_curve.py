"""Fused Pallas TPU kernels for BN254 G1 Jacobian point add / double.

The MSM inner loop (msm/msm.py) is a chain of batched point adds; with the
generic path every field multiply inside one point add is a separate
pallas_call — ~24 kernel launches and HBM round-trips per add. These kernels
compute the ENTIRE unified Jacobian add (including the double path and
infinity masks, branch-free) inside VMEM: 6 coordinate blocks in, 3 out, all
~24 Montgomery multiplies inline with zero intermediate HBM traffic. This is
the speed-of-light shape for the hot op: HBM cost drops from ~50 array
round-trips to 9 per add.

Layout matches fields/pallas_mont.py: limbs on sublanes (16), batch on lanes
(TILE, multiple of 128), uint32 lazy-carry CIOS per multiply. The modulus is
threaded in as a (16, 1) VMEM ref (Pallas forbids captured constants).

Replaces websnark's sequential WASM point arithmetic (SURVEY §2.4 row 1) on
the TPU path; bit-exact vs curve/weierstrass.py (tests/test_pallas_curve.py).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.limbs import N_LIMBS, LIMB_BITS, MASK
from ..fields.mont import FQ

TILE = 256            # lanes per grid step
MIN_BATCH = 1    # always fuse on TPU: one padded-tile kernel beats a
                 # ~20k-HLO generic graph in BOTH compile and dispatch
ACC = N_LIMBS + 2

_N0 = np.uint32(FQ.n0inv)
_MOD_NP = np.asarray(
    [(FQ.p >> (16 * i)) & 0xFFFF for i in range(N_LIMBS)],
    np.uint32).reshape(N_LIMBS, 1)


# -- in-kernel field primitives (operate on (16, W) uint32 blocks; `n` is the
#    (16, 1) modulus block read from the kernel's first input ref) -----------

# CIOS round-loop unroll factor. 16 = fully unrolled (round-4 behavior);
# smaller factors wrap the rounds in a lax.fori_loop, shrinking each
# kernel's Mosaic module ~16/u-fold — the compile-time lever (pallas
# executables are NOT persisted by the compilation cache, so every
# process pays these compiles). Read once at import.
CIOS_UNROLL = int(os.environ.get("ZKROLLUP_CIOS_UNROLL", "4"))


def _k_mont_mul(n, a, b):
    """CIOS Montgomery product (pallas_mont.py logic); round loop rolled
    by CIOS_UNROLL (compile time) without changing the math."""
    w = a.shape[1]
    z1 = jnp.zeros((1, w), jnp.uint32)
    z2 = jnp.zeros((2, w), jnp.uint32)

    def acc(t, v):
        return (t
                + jnp.concatenate([v & MASK, z2], axis=0)
                + jnp.concatenate([z1, v >> LIMB_BITS, z1], axis=0))

    def one_round(t, ai):
        t = acc(t, ai * b)
        m = (t[0:1] * _N0) & MASK
        t = acc(t, m * n)
        carry0 = t[0:1] >> LIMB_BITS
        return jnp.concatenate([t[1:2] + carry0, t[2:], z1], axis=0)

    t = jnp.zeros((ACC, w), jnp.uint32)
    # interpret mode (tests, off-TPU) must use the unrolled form: an eager
    # lax.fori_loop compiles its body per call site, which is far slower
    # than the plain eager ops it replaces
    if CIOS_UNROLL >= N_LIMBS or jax.default_backend() != "tpu":
        for i in range(N_LIMBS):
            t = one_round(t, a[i:i + 1])
    else:
        u = max(CIOS_UNROLL, 1)
        assert N_LIMBS % u == 0

        # Mosaic supports neither partial fori_loop unroll nor
        # dynamic_slice on values: roll the unroll factor by hand, cycling
        # the multiplier rows through the loop carry with STATIC slices —
        # each iteration consumes the top `u` rows and rotates them away
        def body(j, state):
            t, a_rot = state
            for k in range(u):
                t = one_round(t, a_rot[k:k + 1])
            a_rot = jnp.concatenate([a_rot[u:], a_rot[:u]], axis=0)
            return (t, a_rot)
        t, _ = jax.lax.fori_loop(0, N_LIMBS // u, body, (t, a))

    carry = jnp.zeros((w,), jnp.uint32)
    rows = []
    for i in range(ACC):
        v = t[i] + carry
        rows.append(v & MASK)
        carry = v >> LIMB_BITS
    t = jnp.stack(rows)

    borrow = jnp.zeros((w,), jnp.uint32)
    drows = []
    for i in range(ACC):
        ni = n[i, 0] if i < N_LIMBS else np.uint32(0)
        v = t[i] - ni - borrow
        drows.append(v & MASK)
        borrow = (v >> 31) & 1
    d = jnp.stack(drows)
    return jnp.where((borrow == 0)[None], d, t)[:N_LIMBS]


def _k_sqr(n, a):
    return _k_mont_mul(n, a, a)


def _k_sub_borrow(a, b):
    """(a - b) limbs + final borrow (W,). b may be (16, 1) (broadcast)."""
    w = a.shape[1]
    borrow = jnp.zeros((w,), jnp.uint32)
    rows = []
    for i in range(N_LIMBS):
        v = a[i] - b[i] - borrow
        rows.append(v & MASK)
        borrow = (v >> 31) & 1
    return jnp.stack(rows), borrow


def _k_add_raw(a, b):
    """(a + b) canonicalized limbs + final carry (W,)."""
    w = a.shape[1]
    carry = jnp.zeros((w,), jnp.uint32)
    rows = []
    for i in range(N_LIMBS):
        v = a[i] + b[i] + carry
        rows.append(v & MASK)
        carry = v >> LIMB_BITS
    return jnp.stack(rows), carry


def _k_add(n, a, b):
    """Modular add: a + b - p if overflow or >= p."""
    s, carry = _k_add_raw(a, b)
    d, borrow = _k_sub_borrow(s, n)
    take_d = jnp.logical_or(carry != 0, borrow == 0)
    return jnp.where(take_d[None], d, s)


def _k_sub(n, a, b):
    """Modular sub: a - b + p on borrow."""
    d, borrow = _k_sub_borrow(a, b)
    dp, _ = _k_add_raw(d, jnp.broadcast_to(n, d.shape))
    return jnp.where((borrow != 0)[None], dp, d)


def _k_dbl(n, a):
    return _k_add(n, a, a)


def _k_is_zero(a):
    """(16, W) -> (W,) bool."""
    acc = a[0]
    for i in range(1, N_LIMBS):
        acc = acc | a[i]
    return acc == 0


def _k_select(cond_w, a, b):
    """cond (W,) bool -> where(cond, a, b) per lane."""
    return jnp.where(cond_w[None], a, b)


def _k_double_point(n, X, Y, Z):
    """dbl-2007-bl for a = 0; returns (X3, Y3, Z3)."""
    A = _k_sqr(n, X)
    B = _k_sqr(n, Y)
    C = _k_sqr(n, B)
    t = _k_sqr(n, _k_add(n, X, B))
    D = _k_dbl(n, _k_sub(n, _k_sub(n, t, A), C))
    E = _k_add(n, _k_dbl(n, A), A)
    F2 = _k_sqr(n, E)
    X3 = _k_sub(n, F2, _k_dbl(n, D))
    C8 = _k_dbl(n, _k_dbl(n, _k_dbl(n, C)))
    Y3 = _k_sub(n, _k_mont_mul(n, E, _k_sub(n, D, X3)), C8)
    Z3 = _k_mont_mul(n, _k_dbl(n, Y), Z)
    return X3, Y3, Z3


def _add_kernel(n_ref, x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, z2_ref,
                x3_ref, y3_ref, z3_ref):
    n = n_ref[:]
    X1, Y1, Z1 = x1_ref[:], y1_ref[:], z1_ref[:]
    X2, Y2, Z2 = x2_ref[:], y2_ref[:], z2_ref[:]

    Z1Z1 = _k_sqr(n, Z1)
    Z2Z2 = _k_sqr(n, Z2)
    U1 = _k_mont_mul(n, X1, Z2Z2)
    U2 = _k_mont_mul(n, X2, Z1Z1)
    S1 = _k_mont_mul(n, _k_mont_mul(n, Y1, Z2), Z2Z2)
    S2 = _k_mont_mul(n, _k_mont_mul(n, Y2, Z1), Z1Z1)
    H = _k_sub(n, U2, U1)
    R = _k_sub(n, S2, S1)

    HH = _k_sqr(n, H)
    HHH = _k_mont_mul(n, H, HH)
    V = _k_mont_mul(n, U1, HH)
    X3 = _k_sub(n, _k_sub(n, _k_sqr(n, R), HHH), _k_dbl(n, V))
    Y3 = _k_sub(n, _k_mont_mul(n, R, _k_sub(n, V, X3)),
                _k_mont_mul(n, S1, HHH))
    Z3 = _k_mont_mul(n, _k_mont_mul(n, Z1, Z2), H)

    dX, dY, dZ = _k_double_point(n, X1, Y1, Z1)

    h_zero = _k_is_zero(H)
    r_zero = _k_is_zero(R)
    p_inf = _k_is_zero(Z1)
    q_inf = _k_is_zero(Z2)

    same = jnp.logical_and(h_zero, r_zero)
    X3 = _k_select(same, dX, X3)
    Y3 = _k_select(same, dY, Y3)
    Z3 = _k_select(same, dZ, Z3)

    # same x, opposite y (and neither infinite) -> infinity (Z = 0)
    to_inf = jnp.logical_and(
        jnp.logical_and(h_zero, jnp.logical_not(r_zero)),
        jnp.logical_and(jnp.logical_not(p_inf), jnp.logical_not(q_inf)))
    Z3 = _k_select(to_inf, jnp.zeros_like(Z3), Z3)

    # identity cases
    X3 = _k_select(p_inf, X2, X3)
    Y3 = _k_select(p_inf, Y2, Y3)
    Z3 = _k_select(p_inf, Z2, Z3)
    X3 = _k_select(q_inf, X1, X3)
    Y3 = _k_select(q_inf, Y1, Y3)
    Z3 = _k_select(q_inf, Z1, Z3)

    x3_ref[:] = X3
    y3_ref[:] = Y3
    z3_ref[:] = Z3


def _add_z01_kernel(n_ref, x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, z2_ref,
                    x3_ref, y3_ref, z3_ref):
    """Unified add for inputs with Z in {0, 1} exactly (the MSM merge
    tree's leaf level): 4M+2S add + 1M+5S double vs the generic kernel's
    12M+4S + 2M+5S — ~1.9x fewer limb multiplies on half the tree's adds."""
    n = n_ref[:]
    X1, Y1, Z1 = x1_ref[:], y1_ref[:], z1_ref[:]
    X2, Y2, Z2 = x2_ref[:], y2_ref[:], z2_ref[:]

    # add path (Z1 = Z2 = 1): U1=X1, U2=X2, S1=Y1, S2=Y2
    H = _k_sub(n, X2, X1)
    R = _k_sub(n, Y2, Y1)
    HH = _k_sqr(n, H)
    HHH = _k_mont_mul(n, H, HH)
    V = _k_mont_mul(n, X1, HH)
    X3 = _k_sub(n, _k_sub(n, _k_sqr(n, R), HHH), _k_dbl(n, V))
    Y3 = _k_sub(n, _k_mont_mul(n, R, _k_sub(n, V, X3)),
                _k_mont_mul(n, Y1, HHH))
    Z3 = H

    # affine double path (mdbl, Z = 1): Z3 = 2Y
    A = _k_sqr(n, X1)
    B = _k_sqr(n, Y1)
    C = _k_sqr(n, B)
    t = _k_sqr(n, _k_add(n, X1, B))
    D = _k_dbl(n, _k_sub(n, _k_sub(n, t, A), C))
    E = _k_add(n, _k_dbl(n, A), A)
    F2 = _k_sqr(n, E)
    dX = _k_sub(n, F2, _k_dbl(n, D))
    C8 = _k_dbl(n, _k_dbl(n, _k_dbl(n, C)))
    dY = _k_sub(n, _k_mont_mul(n, E, _k_sub(n, D, dX)), C8)
    dZ = _k_dbl(n, Y1)

    h_zero = _k_is_zero(H)
    r_zero = _k_is_zero(R)
    p_inf = _k_is_zero(Z1)
    q_inf = _k_is_zero(Z2)

    same = jnp.logical_and(h_zero, r_zero)
    X3 = _k_select(same, dX, X3)
    Y3 = _k_select(same, dY, Y3)
    Z3 = _k_select(same, dZ, Z3)

    to_inf = jnp.logical_and(
        jnp.logical_and(h_zero, jnp.logical_not(r_zero)),
        jnp.logical_and(jnp.logical_not(p_inf), jnp.logical_not(q_inf)))
    Z3 = _k_select(to_inf, jnp.zeros_like(Z3), Z3)

    X3 = _k_select(p_inf, X2, X3)
    Y3 = _k_select(p_inf, Y2, Y3)
    Z3 = _k_select(p_inf, Z2, Z3)
    X3 = _k_select(q_inf, X1, X3)
    Y3 = _k_select(q_inf, Y1, Y3)
    Z3 = _k_select(q_inf, Z1, Z3)

    x3_ref[:] = X3
    y3_ref[:] = Y3
    z3_ref[:] = Z3


def _add_nd_kernel(n_ref, x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, z2_ref,
                   x3_ref, y3_ref, z3_ref):
    """Jacobian add for DISTINCT operands: the double path is omitted
    (saves the 2M+5S mdbl + its selects, ~30% of the generic kernel's
    multiplies). Contract (msm.py scan phase): p and q are never the same
    non-infinity point — operands are sums of different non-empty subsets
    of a duplicate-free table, so equality requires a subset-sum collision
    in x (cryptographically negligible; the prover's mandatory self-verify
    is the backstop). Infinity on either side and p == -q (H = 0, R != 0
    -> infinity) remain exact."""
    n = n_ref[:]
    X1, Y1, Z1 = x1_ref[:], y1_ref[:], z1_ref[:]
    X2, Y2, Z2 = x2_ref[:], y2_ref[:], z2_ref[:]

    Z1Z1 = _k_sqr(n, Z1)
    Z2Z2 = _k_sqr(n, Z2)
    U1 = _k_mont_mul(n, X1, Z2Z2)
    U2 = _k_mont_mul(n, X2, Z1Z1)
    S1 = _k_mont_mul(n, _k_mont_mul(n, Y1, Z2), Z2Z2)
    S2 = _k_mont_mul(n, _k_mont_mul(n, Y2, Z1), Z1Z1)
    H = _k_sub(n, U2, U1)
    R = _k_sub(n, S2, S1)

    HH = _k_sqr(n, H)
    HHH = _k_mont_mul(n, H, HH)
    V = _k_mont_mul(n, U1, HH)
    X3 = _k_sub(n, _k_sub(n, _k_sqr(n, R), HHH), _k_dbl(n, V))
    Y3 = _k_sub(n, _k_mont_mul(n, R, _k_sub(n, V, X3)),
                _k_mont_mul(n, S1, HHH))
    Z3 = _k_mont_mul(n, _k_mont_mul(n, Z1, Z2), H)

    h_zero = _k_is_zero(H)
    p_inf = _k_is_zero(Z1)
    q_inf = _k_is_zero(Z2)

    # same x, neither infinite -> p == -q (or an excluded double): infinity
    to_inf = jnp.logical_and(
        h_zero,
        jnp.logical_and(jnp.logical_not(p_inf), jnp.logical_not(q_inf)))
    Z3 = _k_select(to_inf, jnp.zeros_like(Z3), Z3)

    X3 = _k_select(p_inf, X2, X3)
    Y3 = _k_select(p_inf, Y2, Y3)
    Z3 = _k_select(p_inf, Z2, Z3)
    X3 = _k_select(q_inf, X1, X3)
    Y3 = _k_select(q_inf, Y1, Y3)
    Z3 = _k_select(q_inf, Z1, Z3)

    x3_ref[:] = X3
    y3_ref[:] = Y3
    z3_ref[:] = Z3


def _make_madd_kernel(distinct: bool):
    """Mixed add: P (Jacobian) + Q (affine-or-infinity, Z2 in {0, 1}).
    madd-2007-bl shape — 8M+3S on the add path vs the generic kernel's
    12M+4S, and the double path is the 1M+5S affine mdbl. With
    distinct=True the double path is omitted entirely (msm.py chunked-scan
    contract: the accumulator never equals the incoming table point)."""

    def kernel(n_ref, x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, z2_ref,
               x3_ref, y3_ref, z3_ref):
        n = n_ref[:]
        X1, Y1, Z1 = x1_ref[:], y1_ref[:], z1_ref[:]
        x2, y2, Z2 = x2_ref[:], y2_ref[:], z2_ref[:]

        Z1Z1 = _k_sqr(n, Z1)
        U2 = _k_mont_mul(n, x2, Z1Z1)
        S2 = _k_mont_mul(n, _k_mont_mul(n, y2, Z1), Z1Z1)
        H = _k_sub(n, U2, X1)
        R = _k_sub(n, S2, Y1)
        HH = _k_sqr(n, H)
        HHH = _k_mont_mul(n, H, HH)
        V = _k_mont_mul(n, X1, HH)
        X3 = _k_sub(n, _k_sub(n, _k_sqr(n, R), HHH), _k_dbl(n, V))
        Y3 = _k_sub(n, _k_mont_mul(n, R, _k_sub(n, V, X3)),
                    _k_mont_mul(n, Y1, HHH))
        Z3 = _k_mont_mul(n, Z1, H)

        h_zero = _k_is_zero(H)
        p_inf = _k_is_zero(Z1)
        q_inf = _k_is_zero(Z2)

        if distinct:
            to_inf = jnp.logical_and(
                h_zero, jnp.logical_and(jnp.logical_not(p_inf),
                                        jnp.logical_not(q_inf)))
            Z3 = _k_select(to_inf, jnp.zeros_like(Z3), Z3)
        else:
            r_zero = _k_is_zero(R)
            # affine double of q (mdbl, Z2 = 1): acc == q on this path
            A = _k_sqr(n, x2)
            B = _k_sqr(n, y2)
            C = _k_sqr(n, B)
            t = _k_sqr(n, _k_add(n, x2, B))
            D = _k_dbl(n, _k_sub(n, _k_sub(n, t, A), C))
            E = _k_add(n, _k_dbl(n, A), A)
            F2 = _k_sqr(n, E)
            dX = _k_sub(n, F2, _k_dbl(n, D))
            C8 = _k_dbl(n, _k_dbl(n, _k_dbl(n, C)))
            dY = _k_sub(n, _k_mont_mul(n, E, _k_sub(n, D, dX)), C8)
            dZ = _k_dbl(n, y2)
            same = jnp.logical_and(h_zero, r_zero)
            X3 = _k_select(same, dX, X3)
            Y3 = _k_select(same, dY, Y3)
            Z3 = _k_select(same, dZ, Z3)
            to_inf = jnp.logical_and(
                jnp.logical_and(h_zero, jnp.logical_not(r_zero)),
                jnp.logical_and(jnp.logical_not(p_inf),
                                jnp.logical_not(q_inf)))
            Z3 = _k_select(to_inf, jnp.zeros_like(Z3), Z3)

        X3 = _k_select(p_inf, x2, X3)
        Y3 = _k_select(p_inf, y2, Y3)
        Z3 = _k_select(p_inf, Z2, Z3)
        X3 = _k_select(q_inf, X1, X3)
        Y3 = _k_select(q_inf, Y1, Y3)
        Z3 = _k_select(q_inf, Z1, Z3)

        x3_ref[:] = X3
        y3_ref[:] = Y3
        z3_ref[:] = Z3

    return kernel


_madd_kernel = _make_madd_kernel(distinct=False)
_madd_nd_kernel = _make_madd_kernel(distinct=True)


def _double_kernel(n_ref, x_ref, y_ref, z_ref, x3_ref, y3_ref, z3_ref):
    X3, Y3, Z3 = _k_double_point(n_ref[:], x_ref[:], y_ref[:], z_ref[:])
    # doubling infinity keeps Z = 0 automatically (Z3 = 2Y*Z = 0); the
    # formula is total for a=0 curves with our Z==0 encoding
    x3_ref[:] = X3
    y3_ref[:] = Y3
    z3_ref[:] = Z3


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pallas_pointwise(kernel, n_out: int, *coords):
    """Run `kernel` over (n, 16) coordinate arrays tiled to (16, TILE).
    In interpret mode (tests) per-op dispatch dominates — a fixed
    128-lane tile keeps one grid step for test batches."""
    n = coords[0].shape[0]
    tile = 128 if _interpret() else TILE
    n_pad = -(-n // tile) * tile
    ins = []
    for c in coords:
        c2 = c
        if n_pad != n:
            c2 = jnp.pad(c2, ((0, n_pad - n), (0, 0)))
        ins.append(jnp.moveaxis(c2, -1, 0))  # (16, n_pad) limb-major
    spec = pl.BlockSpec((N_LIMBS, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    n_spec = pl.BlockSpec((N_LIMBS, 1), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        in_specs=[n_spec] + [spec] * len(ins),
        out_specs=[spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((N_LIMBS, n_pad), jnp.uint32)
                   for _ in range(n_out)],
        interpret=_interpret(),
    )(jnp.asarray(_MOD_NP), *ins)
    return tuple(jnp.moveaxis(o, 0, -1)[:n] for o in outs)


@jax.jit
def g1_add(p, q):
    """Fused unified Jacobian add: p, q = (X, Y, Z) with (n, 16) leaves."""
    return _pallas_pointwise(_add_kernel, 3, *p, *q)


@jax.jit
def g1_add_z01(p, q):
    """Fused add for Z in {0, 1} inputs (MSM leaf level)."""
    return _pallas_pointwise(_add_z01_kernel, 3, *p, *q)


@jax.jit
def g1_add_nd(p, q):
    """Fused Jacobian add assuming distinct operands (no double path)."""
    return _pallas_pointwise(_add_nd_kernel, 3, *p, *q)


@jax.jit
def g1_madd(p, q):
    """Fused mixed add: p Jacobian, q = (x, y, z) with z in {0, 1}."""
    return _pallas_pointwise(_madd_kernel, 3, *p, *q)


@jax.jit
def g1_madd_nd(p, q):
    """Fused mixed add assuming distinct operands (no double path)."""
    return _pallas_pointwise(_madd_nd_kernel, 3, *p, *q)


@jax.jit
def g1_double(p):
    return _pallas_pointwise(_double_kernel, 3, *p)


_ENV = os.environ.get("ZKROLLUP_PALLAS_CURVE", "auto")


def should_use(p, q=None) -> bool:
    """Dispatch gate: TPU backend, 2D (n, 16) leaves, n >= MIN_BATCH, and
    (for add) matching shapes."""
    if _ENV == "0":
        return False
    if _ENV == "auto" and jax.default_backend() != "tpu":
        return False

    def ok(t):
        return (isinstance(t, tuple) and len(t) == 3
                and all(getattr(c, "ndim", 0) == 2
                        and c.shape == t[0].shape for c in t)
                and t[0].shape[0] >= MIN_BATCH
                and t[0].shape[1] == N_LIMBS)

    if not ok(p):
        return False
    if q is not None:
        if not ok(q) or q[0].shape != p[0].shape:
            return False
    return True
