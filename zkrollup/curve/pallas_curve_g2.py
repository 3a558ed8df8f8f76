"""Fused Pallas TPU kernels for BN254 G2 (Fq2) Jacobian point add/double.

Round-4 verdict #3: the device G2 MSM was compile-pathological because
every Fq2 multiply expanded through the generic XLA CIOS graph — ~23 Fq2
ops per unified add, each ~600 HLO ops, times 2*log2(n) unrolled scan
levels. These kernels compute the ENTIRE Fq2 point add inside VMEM exactly
like pallas_curve.py does for G1: each coordinate is a PAIR of 16-limb
blocks, Fq2 multiply is 3 Karatsuba CIOS multiplies, and a whole add is
ONE pallas_call. With the chunked scan (msm.py) the G2 MSM both compiles
in seconds and runs on-device, removing the libzkhost host fallback
(groth16/prove.py) as a requirement.

Replaces websnark's WASM G2 multiexp leg (πB — SURVEY §2.4 row 1,
/root/reference/operator/src/snarks/common.ts:29). Bit-exact vs the
generic weierstrass path (tests/test_pallas_curve_g2.py).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.limbs import N_LIMBS
from .pallas_curve import (_k_mont_mul, _k_add, _k_sub, _k_dbl, _k_is_zero,
                           _k_select, _MOD_NP)

TILE = 256
MIN_BATCH = 1    # always fuse on TPU: one padded-tile kernel beats a
                 # ~20k-HLO generic graph in BOTH compile and dispatch


# -- Fq2 primitives on pairs of (16, W) blocks --------------------------------

def _k2_add(n, a, b):
    return (_k_add(n, a[0], b[0]), _k_add(n, a[1], b[1]))


def _k2_sub(n, a, b):
    return (_k_sub(n, a[0], b[0]), _k_sub(n, a[1], b[1]))


def _k2_dbl(n, a):
    return (_k_dbl(n, a[0]), _k_dbl(n, a[1]))


def _k2_mul(n, a, b):
    """Karatsuba: 3 base multiplies for (a0 + a1 u)(b0 + b1 u), u^2 = -1."""
    t0 = _k_mont_mul(n, a[0], b[0])
    t1 = _k_mont_mul(n, a[1], b[1])
    t2 = _k_mont_mul(n, _k_add(n, a[0], a[1]), _k_add(n, b[0], b[1]))
    return (_k_sub(n, t0, t1), _k_sub(n, _k_sub(n, t2, t0), t1))


def _k2_sqr(n, a):
    """(a0^2 - a1^2, 2 a0 a1) via 2 base multiplies."""
    re = _k_mont_mul(n, _k_add(n, a[0], a[1]), _k_sub(n, a[0], a[1]))
    im = _k_dbl(n, _k_mont_mul(n, a[0], a[1]))
    return (re, im)


def _k2_is_zero(a):
    return jnp.logical_and(_k_is_zero(a[0]), _k_is_zero(a[1]))


def _k2_select(c, a, b):
    return (_k_select(c, a[0], b[0]), _k_select(c, a[1], b[1]))


def _k2_double_point(n, X, Y, Z):
    A = _k2_sqr(n, X)
    B = _k2_sqr(n, Y)
    C = _k2_sqr(n, B)
    t = _k2_sqr(n, _k2_add(n, X, B))
    D = _k2_dbl(n, _k2_sub(n, _k2_sub(n, t, A), C))
    E = _k2_add(n, _k2_dbl(n, A), A)
    F2 = _k2_sqr(n, E)
    X3 = _k2_sub(n, F2, _k2_dbl(n, D))
    C8 = _k2_dbl(n, _k2_dbl(n, _k2_dbl(n, C)))
    Y3 = _k2_sub(n, _k2_mul(n, E, _k2_sub(n, D, X3)), C8)
    Z3 = _k2_mul(n, _k2_dbl(n, Y), Z)
    return X3, Y3, Z3


# -- kernels ------------------------------------------------------------------
# ref layout: each Fq2 coordinate is two consecutive refs (re, im).

def _unpack_refs(refs):
    return [(refs[i][:], refs[i + 1][:]) for i in range(0, len(refs), 2)]


def _store(ref_re, ref_im, v):
    ref_re[:] = v[0]
    ref_im[:] = v[1]


def _make_add_kernel(distinct: bool):
    def kernel(n_ref, *refs):
        n = n_ref[:]
        ins, outs = refs[:12], refs[12:]
        X1, Y1, Z1, X2, Y2, Z2 = _unpack_refs(ins)

        Z1Z1 = _k2_sqr(n, Z1)
        Z2Z2 = _k2_sqr(n, Z2)
        U1 = _k2_mul(n, X1, Z2Z2)
        U2 = _k2_mul(n, X2, Z1Z1)
        S1 = _k2_mul(n, _k2_mul(n, Y1, Z2), Z2Z2)
        S2 = _k2_mul(n, _k2_mul(n, Y2, Z1), Z1Z1)
        H = _k2_sub(n, U2, U1)
        R = _k2_sub(n, S2, S1)

        HH = _k2_sqr(n, H)
        HHH = _k2_mul(n, H, HH)
        V = _k2_mul(n, U1, HH)
        X3 = _k2_sub(n, _k2_sub(n, _k2_sqr(n, R), HHH), _k2_dbl(n, V))
        Y3 = _k2_sub(n, _k2_mul(n, R, _k2_sub(n, V, X3)),
                     _k2_mul(n, S1, HHH))
        Z3 = _k2_mul(n, _k2_mul(n, Z1, Z2), H)

        h_zero = _k2_is_zero(H)
        p_inf = _k2_is_zero(Z1)
        q_inf = _k2_is_zero(Z2)

        if distinct:
            to_inf = jnp.logical_and(
                h_zero, jnp.logical_and(jnp.logical_not(p_inf),
                                        jnp.logical_not(q_inf)))
            Z3 = _k2_select(to_inf, (jnp.zeros_like(Z3[0]),
                                     jnp.zeros_like(Z3[1])), Z3)
        else:
            r_zero = _k2_is_zero(R)
            dX, dY, dZ = _k2_double_point(n, X1, Y1, Z1)
            same = jnp.logical_and(h_zero, r_zero)
            X3 = _k2_select(same, dX, X3)
            Y3 = _k2_select(same, dY, Y3)
            Z3 = _k2_select(same, dZ, Z3)
            to_inf = jnp.logical_and(
                jnp.logical_and(h_zero, jnp.logical_not(r_zero)),
                jnp.logical_and(jnp.logical_not(p_inf),
                                jnp.logical_not(q_inf)))
            Z3 = _k2_select(to_inf, (jnp.zeros_like(Z3[0]),
                                     jnp.zeros_like(Z3[1])), Z3)

        X3 = _k2_select(p_inf, X2, X3)
        Y3 = _k2_select(p_inf, Y2, Y3)
        Z3 = _k2_select(p_inf, Z2, Z3)
        X3 = _k2_select(q_inf, X1, X3)
        Y3 = _k2_select(q_inf, Y1, Y3)
        Z3 = _k2_select(q_inf, Z1, Z3)

        _store(outs[0], outs[1], X3)
        _store(outs[2], outs[3], Y3)
        _store(outs[4], outs[5], Z3)

    return kernel


def _make_madd_kernel(distinct: bool):
    """Mixed add: P Jacobian + Q with Z2 in {(0,0), (1,0)} exactly."""

    def kernel(n_ref, *refs):
        n = n_ref[:]
        ins, outs = refs[:12], refs[12:]
        X1, Y1, Z1, x2, y2, Z2 = _unpack_refs(ins)

        Z1Z1 = _k2_sqr(n, Z1)
        U2 = _k2_mul(n, x2, Z1Z1)
        S2 = _k2_mul(n, _k2_mul(n, y2, Z1), Z1Z1)
        H = _k2_sub(n, U2, X1)
        R = _k2_sub(n, S2, Y1)
        HH = _k2_sqr(n, H)
        HHH = _k2_mul(n, H, HH)
        V = _k2_mul(n, X1, HH)
        X3 = _k2_sub(n, _k2_sub(n, _k2_sqr(n, R), HHH), _k2_dbl(n, V))
        Y3 = _k2_sub(n, _k2_mul(n, R, _k2_sub(n, V, X3)),
                     _k2_mul(n, Y1, HHH))
        Z3 = _k2_mul(n, Z1, H)

        h_zero = _k2_is_zero(H)
        p_inf = _k2_is_zero(Z1)
        q_inf = _k2_is_zero(Z2)

        if distinct:
            to_inf = jnp.logical_and(
                h_zero, jnp.logical_and(jnp.logical_not(p_inf),
                                        jnp.logical_not(q_inf)))
            Z3 = _k2_select(to_inf, (jnp.zeros_like(Z3[0]),
                                     jnp.zeros_like(Z3[1])), Z3)
        else:
            r_zero = _k2_is_zero(R)
            # affine double of q (Z2 = 1)
            A = _k2_sqr(n, x2)
            B = _k2_sqr(n, y2)
            C = _k2_sqr(n, B)
            t = _k2_sqr(n, _k2_add(n, x2, B))
            D = _k2_dbl(n, _k2_sub(n, _k2_sub(n, t, A), C))
            E = _k2_add(n, _k2_dbl(n, A), A)
            F2 = _k2_sqr(n, E)
            dX = _k2_sub(n, F2, _k2_dbl(n, D))
            C8 = _k2_dbl(n, _k2_dbl(n, _k2_dbl(n, C)))
            dY = _k2_sub(n, _k2_mul(n, E, _k2_sub(n, D, dX)), C8)
            dZ = _k2_dbl(n, y2)
            same = jnp.logical_and(h_zero, r_zero)
            X3 = _k2_select(same, dX, X3)
            Y3 = _k2_select(same, dY, Y3)
            Z3 = _k2_select(same, dZ, Z3)
            to_inf = jnp.logical_and(
                jnp.logical_and(h_zero, jnp.logical_not(r_zero)),
                jnp.logical_and(jnp.logical_not(p_inf),
                                jnp.logical_not(q_inf)))
            Z3 = _k2_select(to_inf, (jnp.zeros_like(Z3[0]),
                                     jnp.zeros_like(Z3[1])), Z3)

        X3 = _k2_select(p_inf, x2, X3)
        Y3 = _k2_select(p_inf, y2, Y3)
        Z3 = _k2_select(p_inf, Z2, Z3)
        X3 = _k2_select(q_inf, X1, X3)
        Y3 = _k2_select(q_inf, Y1, Y3)
        Z3 = _k2_select(q_inf, Z1, Z3)

        _store(outs[0], outs[1], X3)
        _store(outs[2], outs[3], Y3)
        _store(outs[4], outs[5], Z3)

    return kernel


def _double_kernel(n_ref, *refs):
    ins, outs = refs[:6], refs[6:]
    X, Y, Z = _unpack_refs(ins)
    X3, Y3, Z3 = _k2_double_point(n_ref[:], X, Y, Z)
    _store(outs[0], outs[1], X3)
    _store(outs[2], outs[3], Y3)
    _store(outs[4], outs[5], Z3)


_add_kernel = _make_add_kernel(distinct=False)
_add_nd_kernel = _make_add_kernel(distinct=True)
_madd_kernel = _make_madd_kernel(distinct=False)
_madd_nd_kernel = _make_madd_kernel(distinct=True)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _flatten_pt(p):
    """((x0,x1),(y0,y1),(z0,z1)) -> [x0, x1, y0, y1, z0, z1]."""
    return [c for coord in p for c in coord]


def _pallas_pointwise(kernel, *coords):
    n = coords[0].shape[0]
    # interpret mode (tests): per-op dispatch dominates; a fixed 128-lane
    # tile keeps one grid step for test batches without the slow sub-lane
    # shapes a tile of exactly n produces
    tile = 128 if _interpret() else TILE
    n_pad = -(-n // tile) * tile
    ins = []
    for c in coords:
        c2 = c
        if n_pad != n:
            c2 = jnp.pad(c2, ((0, n_pad - n), (0, 0)))
        ins.append(jnp.moveaxis(c2, -1, 0))
    spec = pl.BlockSpec((N_LIMBS, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    n_spec = pl.BlockSpec((N_LIMBS, 1), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        in_specs=[n_spec] + [spec] * len(ins),
        out_specs=[spec] * 6,
        out_shape=[jax.ShapeDtypeStruct((N_LIMBS, n_pad), jnp.uint32)
                   for _ in range(6)],
        interpret=_interpret(),
    )(jnp.asarray(_MOD_NP), *ins)
    o = [jnp.moveaxis(a, 0, -1)[:n] for a in outs]
    return ((o[0], o[1]), (o[2], o[3]), (o[4], o[5]))


@jax.jit
def g2_add(p, q):
    return _pallas_pointwise(_add_kernel, *_flatten_pt(p), *_flatten_pt(q))


@jax.jit
def g2_add_nd(p, q):
    return _pallas_pointwise(_add_nd_kernel, *_flatten_pt(p),
                             *_flatten_pt(q))


@jax.jit
def g2_madd(p, q):
    return _pallas_pointwise(_madd_kernel, *_flatten_pt(p), *_flatten_pt(q))


@jax.jit
def g2_madd_nd(p, q):
    return _pallas_pointwise(_madd_nd_kernel, *_flatten_pt(p),
                             *_flatten_pt(q))


@jax.jit
def g2_double(p):
    return _pallas_pointwise(_double_kernel, *_flatten_pt(p))


_ENV = os.environ.get("ZKROLLUP_PALLAS_CURVE", "auto")


def should_use(p, q=None) -> bool:
    """TPU backend, Fq2 pytree with 2D (n, 16) leaves, n >= MIN_BATCH."""
    if _ENV == "0":
        return False
    if _ENV == "auto" and jax.default_backend() != "tpu":
        return False

    def ok(t):
        if not (isinstance(t, tuple) and len(t) == 3):
            return False
        for coord in t:
            if not (isinstance(coord, tuple) and len(coord) == 2):
                return False
            for c in coord:
                if (getattr(c, "ndim", 0) != 2
                        or c.shape != t[0][0].shape
                        or c.shape[1] != N_LIMBS):
                    return False
        return t[0][0].shape[0] >= MIN_BATCH

    if not ok(p):
        return False
    if q is not None:
        if not ok(q) or q[0][0].shape != p[0][0].shape:
            return False
    return True
