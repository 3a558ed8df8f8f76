"""Batched Fq2 = Fq[u]/(u^2+1) arithmetic on limb arrays (for BN254 G2).

An Fq2 element is a pair (c0, c1) of (..., 16) Montgomery-form Fq limb
arrays. Multiplication is Karatsuba (3 mont_muls); used by the G2 point
kernels behind the Groth16 pi_B MSM (SURVEY §2.4: websnark's G2 multiexp).
"""

from __future__ import annotations

import jax.numpy as jnp

from .mont import FQ
from . import limbs as L


def add(a, b):
    return (FQ.add(a[0], b[0]), FQ.add(a[1], b[1]))


def sub(a, b):
    return (FQ.sub(a[0], b[0]), FQ.sub(a[1], b[1]))


def neg(a):
    return (FQ.neg(a[0]), FQ.neg(a[1]))


def mul(a, b):
    """(a0 + a1 u)(b0 + b1 u), u^2 = -1; Karatsuba."""
    t0 = FQ.mont_mul(a[0], b[0])
    t1 = FQ.mont_mul(a[1], b[1])
    t01 = FQ.mont_mul(FQ.add(a[0], a[1]), FQ.add(b[0], b[1]))
    return (FQ.sub(t0, t1), FQ.sub(FQ.sub(t01, t0), t1))


def sqr(a):
    """(a0+a1)(a0-a1) + 2 a0 a1 u — 2 mont_muls."""
    t0 = FQ.mont_mul(FQ.add(a[0], a[1]), FQ.sub(a[0], a[1]))
    t1 = FQ.mont_mul(a[0], a[1])
    return (t0, FQ.add(t1, t1))


def scalar_mul_small(a, k: int):
    """Multiply by a small integer via repeated addition (k <= 8ish)."""
    acc = a
    for _ in range(k - 1):
        acc = add(acc, a)
    return acc


def inv(a):
    """1/(a0 + a1 u) = conj(a)/(a0^2 + a1^2)."""
    norm = FQ.add(FQ.mont_mul(a[0], a[0]), FQ.mont_mul(a[1], a[1]))
    ninv = FQ.mont_inv(norm)
    return (FQ.mont_mul(a[0], ninv), FQ.neg(FQ.mont_mul(a[1], ninv)))


def is_zero(a):
    return jnp.logical_and(L.is_zero(a[0]), L.is_zero(a[1]))


def select(cond, a, b):
    return (L.select(cond, a[0], b[0]), L.select(cond, a[1], b[1]))


def zeros(batch_shape):
    z = jnp.zeros(batch_shape + (L.N_LIMBS,), jnp.uint32)
    return (z, z)


def broadcast_to(a, batch_shape):
    return (jnp.broadcast_to(a[0], batch_shape + (L.N_LIMBS,)),
            jnp.broadcast_to(a[1], batch_shape + (L.N_LIMBS,)))


# host encode/decode ---------------------------------------------------------

def to_mont_host(pairs):
    """list[(int,int)] -> ((n,16),(n,16)) numpy arrays."""
    c0 = FQ.to_mont_host([p[0] for p in pairs])
    c1 = FQ.to_mont_host([p[1] for p in pairs])
    return (c0, c1)


def from_mont_host(a):
    import numpy as np
    c0 = FQ.from_mont_host(np.asarray(a[0]))
    c1 = FQ.from_mont_host(np.asarray(a[1]))
    return list(zip(c0, c1))
