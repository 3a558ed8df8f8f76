"""GLV endomorphism-accelerated G1 MSM for BN254.

BN254 has CM discriminant -3: the curve automorphism phi(x, y) = (beta*x, y)
with beta a primitive cube root of unity in Fq acts as multiplication by
lambda (a cube root of unity mod r) on G1. Every 254-bit scalar k splits as
k = k1 + k2*lambda with |k1|, |k2| < 2^128 (lattice Babai rounding), so the
MSM runs over twice the points with HALF the windows — ~2x fewer point adds
in the Pippenger bucket phase and half the Horner doublings. websnark (the
reference's multiexp engine, SURVEY §2.4) does not implement GLV; this is
TPU-budget headroom the redesign banks.

Decomposition is host-side Python-int arithmetic (4 multiplies per scalar);
the endomorphism table phi(P) is one Montgomery multiply per point on
device. Differentially tested against the plain 256-bit MSM
(tests/test_glv.py).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import limbs as L
from ..fields.mont import FQ
from ..ref.bn254 import R as FR_MOD
from ..curve import g1_jax
from .msm import msm

# lambda^2 + lambda + 1 = 0 mod r;  phi(P) = lambda * P with
# phi(x, y) = (BETA * x, y), beta^2 + beta + 1 = 0 mod q.
LAMBDA = 4407920970296243842393367215006156084916469457145843978461
BETA = 2203960485148121921418603742825762020974279258880205651966

# reduced lattice basis of {(a, b) : a + b*lambda = 0 mod r}
_V1 = (9931322734385697763, -147946756881789319000765030803803410728)
_V2 = (147946756881789319010696353538189108491, 9931322734385697763)

# decomposed halves are < 2^128; 130 bits leaves sign-fold headroom
GLV_BITS = 130


def decompose(k: int) -> Tuple[int, int]:
    """k (mod r) -> (k1, k2), signed, with k = k1 + k2*lambda (mod r)."""
    k %= FR_MOD
    a1, b1 = _V1
    a2, b2 = _V2
    # Babai rounding: (c1, c2) = round( (k, 0) * B^-1 )
    c1 = (b2 * k + FR_MOD // 2) // FR_MOD
    c2 = (-b1 * k + FR_MOD // 2) // FR_MOD
    k1 = k - c1 * a1 - c2 * a2
    k2 = -c1 * b1 - c2 * b2
    return k1, k2


def decompose_batch(scalars: Sequence[int]):
    """-> (abs_limbs (2n, 16) uint32, neg (2n, 1) bool). First n rows are
    k1 (for P), last n rows are k2 (for phi(P)). Dispatches to the native
    C++ engine (zkh_glv_decompose; ~100x the Python loop) when built."""
    from ..native import engine
    if engine.available():
        return engine.glv_decompose_batch(
            [k % FR_MOD for k in scalars])
    return decompose_batch_py(scalars)


def decompose_batch_py(scalars: Sequence[int]):
    """Pure-Python ground truth for the native decomposition."""
    n = len(scalars)
    k1s, k2s, negs = [], [], []
    for k in scalars:
        k1, k2 = decompose(k)
        k1s.append(abs(k1))
        k2s.append(abs(k2))
        negs.append((k1 < 0, k2 < 0))
    abs_limbs = L.ints_to_limbs(k1s + k2s)
    neg = np.asarray([s for s, _ in negs] + [s for _, s in negs],
                     bool)[:, None]
    return abs_limbs, neg


# host-side constant; becomes an XLA literal inside the jitted MSM
_BETA_MONT_NP = L.int_to_limbs(BETA * (1 << 256) % FQ.p)


def _beta_mont():
    return jnp.asarray(_BETA_MONT_NP)


@partial(jax.jit, static_argnames=("c",))
def _msm_glv_device(points_affine, abs_scalars, neg, c: int):
    """points (n, ...) packed affine; abs_scalars (2n, 16); neg (2n, 1)."""
    x, y, inf = points_affine
    n = x.shape[0]
    # endomorphism table: phi(P) = (beta * x, y)
    x2 = jnp.concatenate([x, FQ.mont_mul(x, _beta_mont())], axis=0)
    y2 = jnp.concatenate([y, y], axis=0)
    inf2 = jnp.concatenate([inf, inf], axis=0)
    # fold the decomposition signs into the points: -P = (x, -y)
    y2 = L.select(neg, FQ.neg(y2), y2)
    return msm(g1_jax.G1, (x2, y2, inf2), abs_scalars, c=c,
               n_bits=GLV_BITS)


def msm_glv(points_affine, scalars: Sequence[int], c: int = 10):
    """points_affine: packed (x, y, inf) device/host arrays; scalars: host
    ints. Returns a Jacobian point (the same contract as msm.msm)."""
    abs_limbs, neg = decompose_batch(list(scalars))
    pa = tuple(jnp.asarray(a) for a in points_affine)
    return _msm_glv_device(pa, jnp.asarray(abs_limbs), jnp.asarray(neg), c)
