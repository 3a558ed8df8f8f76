"""Fixed-base batched scalar multiplication for BN254 G1/G2 on TPU.

The Groth16 setup is a few hundred thousand scalar multiplications of the
two fixed generators (key tables A/B1/B2/C/hExps — the tables websnark
consumes via /root/reference/operator/src/utils/binarify.ts:115-204). A
fixed base makes Pippenger unnecessary: precompute per-window multiples of
the generator ON HOST once (tiny: n_windows * 2^c points), then every key
point is n_windows gathers + mixed-adds, batched over the whole table on
the VPU.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.mont import FQ
from ..fields import limbs as L, fq2
from ..ref import bn254 as ref
from ..curve import g1_jax, g2_jax
from .msm import window_digits

WINDOW_C = 8
N_WINDOWS = (256 + WINDOW_C - 1) // WINDOW_C  # 32


@lru_cache(maxsize=None)
def _g1_table_host():
    """(W, 2^c) multiples d * 2^(c*w) * G1_GEN, packed affine mont limbs."""
    pts = []
    base = ref.G1_GEN
    for _ in range(N_WINDOWS):
        acc = None
        row = [None]
        for _ in range(1, 1 << WINDOW_C):
            acc = ref.g1_add(acc, base)
            row.append(acc)
        pts.extend(row)
        base = ref.g1_add(acc, base)  # 2^c * base
    x, y, inf = g1_jax.pack_affine_host(pts)
    shape = (N_WINDOWS, 1 << WINDOW_C)
    return (x.reshape(shape + (L.N_LIMBS,)), y.reshape(shape + (L.N_LIMBS,)),
            inf.reshape(shape + (1,)))


@lru_cache(maxsize=None)
def _g2_table_host():
    pts = []
    base = ref.G2_GEN
    for _ in range(N_WINDOWS):
        acc = None
        row = [None]
        for _ in range(1, 1 << WINDOW_C):
            acc = ref.g2_add(acc, base)
            row.append(acc)
        pts.extend(row)
        base = ref.g2_add(acc, base)
    (x0, x1), (y0, y1), inf = g2_jax.pack_affine_host(pts)
    shape = (N_WINDOWS, 1 << WINDOW_C)
    rs = lambda a: a.reshape(shape + (L.N_LIMBS,))
    return (rs(x0), rs(x1), rs(y0), rs(y1), inf.reshape(shape + (1,)))


def _fixed_base(curve, gather_window, scalars):
    """Shared driver: digits -> per-window gather + mixed_add."""
    n = scalars.shape[0]
    digits = window_digits(scalars, WINDOW_C, N_WINDOWS)  # (W, n)

    def body(w, acc):
        q = gather_window(w, digits[w])
        return curve.mixed_add(acc, q)

    return jax.lax.fori_loop(0, N_WINDOWS, body, curve.infinity((n,)))


def fixed_base_g1(scalars: jnp.ndarray, table=None):
    """scalars: (n, 16) PLAIN-form limbs -> batched Jacobian G1 points
    scalar_i * G1_GEN."""
    tx, ty, tinf = table if table is not None else jax.tree_util.tree_map(
        jnp.asarray, _g1_table_host())

    def gather(w, d):
        return (tx[w][d], ty[w][d], tinf[w][d])

    return _fixed_base(g1_jax.G1, gather, scalars)


def fixed_base_g2(scalars: jnp.ndarray, table=None):
    x0, x1, y0, y1, tinf = table if table is not None else \
        jax.tree_util.tree_map(jnp.asarray, _g2_table_host())

    def gather(w, d):
        return ((x0[w][d], x1[w][d]), (y0[w][d], y1[w][d]), tinf[w][d])

    return _fixed_base(g2_jax.G2, gather, scalars)


# -- device Jacobian -> packed affine (batch-normalized) ---------------------

def g1_normalize_packed(p):
    """Batched Jacobian -> (x, y, inf) packed affine, all on device."""
    X, Y, Z = p
    inf = L.is_zero(Z)
    zsafe = L.select(inf, jnp.broadcast_to(FQ.one_mont, Z.shape), Z)
    zi = FQ.mont_inv(zsafe)
    zi2 = FQ.mont_mul(zi, zi)
    x = FQ.mont_mul(X, zi2)
    y = FQ.mont_mul(Y, FQ.mont_mul(zi2, zi))
    zero = jnp.zeros_like(x)
    return (L.select(inf, zero, x), L.select(inf, zero, y), inf)


def g2_normalize_packed(p):
    X, Y, Z = p
    inf = fq2.is_zero(Z)
    one = (jnp.broadcast_to(FQ.one_mont, Z[0].shape), jnp.zeros_like(Z[0]))
    zsafe = fq2.select(inf, one, Z)
    zi = fq2.inv(zsafe)
    zi2 = fq2.sqr(zi)
    x = fq2.mul(X, zi2)
    y = fq2.mul(Y, fq2.mul(zi2, zi))
    zero = fq2.zeros(Z[0].shape[:-1])
    x = fq2.select(inf, zero, x)
    y = fq2.select(inf, zero, y)
    return (x, y, inf)


_fixed_base_g1_affine = jax.jit(
    lambda sc, tbl: g1_normalize_packed(fixed_base_g1(sc, tbl)))
_fixed_base_g2_affine = jax.jit(
    lambda sc, tbl: g2_normalize_packed(fixed_base_g2(sc, tbl)))


def _use_native_fixed_base() -> bool:
    """Setup is a ONE-SHOT table build: the native C++ fixed-base tables
    (0.16s / 14k points) beat both XLA:CPU (~50x) and a cold-compiled TPU
    program, so prefer native whenever the library is built. Set
    ZKROLLUP_SETUP_BACKEND=device to force the JAX path (differential
    tests do)."""
    import os
    if os.environ.get("ZKROLLUP_SETUP_BACKEND", "auto") == "device":
        return False
    from ..native import engine
    return engine.available()


def g1_points_from_scalars(scalars_int, chunk: int = 1 << 15):
    """Host int scalars -> packed affine (x, y, inf) numpy arrays of
    scalar_i * G1. Chunked so device memory stays bounded."""
    if _use_native_fixed_base():
        from ..native import engine
        return engine.g1_fixed_base_mont(
            engine.ints_to_fr_bytes(scalars_int), len(scalars_int))
    tbl = jax.tree_util.tree_map(jnp.asarray, _g1_table_host())
    xs, ys, infs = [], [], []
    for i in range(0, len(scalars_int), chunk):
        sc = jnp.asarray(L.ints_to_limbs(
            [x % ref.R for x in scalars_int[i:i + chunk]]))
        x, y, inf = _fixed_base_g1_affine(sc, tbl)
        xs.append(np.asarray(x)); ys.append(np.asarray(y))
        infs.append(np.asarray(inf))
    return (np.concatenate(xs), np.concatenate(ys), np.concatenate(infs))


def g2_points_from_scalars(scalars_int, chunk: int = 1 << 14):
    if _use_native_fixed_base():
        from ..native import engine
        return engine.g2_fixed_base_mont(
            engine.ints_to_fr_bytes(scalars_int), len(scalars_int))
    tbl = jax.tree_util.tree_map(jnp.asarray, _g2_table_host())
    out = None
    for i in range(0, len(scalars_int), chunk):
        sc = jnp.asarray(L.ints_to_limbs(
            [x % ref.R for x in scalars_int[i:i + chunk]]))
        (x0, x1), (y0, y1), inf = _fixed_base_g2_affine(sc, tbl)
        part = [np.asarray(a) for a in (x0, x1, y0, y1, inf)]
        out = part if out is None else [
            np.concatenate([a, b]) for a, b in zip(out, part)]
    x0, x1, y0, y1, inf = out
    return ((x0, x1), (y0, y1), inf)
