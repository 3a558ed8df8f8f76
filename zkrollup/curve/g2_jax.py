"""BN254 G2 batched point ops (Jacobian over Fq2) + host packing."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..fields.mont import FQ
from ..fields import limbs as L, fq2
from ..ref import bn254 as ref
from .weierstrass import JacobianCurve, Fq2Ops

G2 = JacobianCurve(Fq2Ops, fused="g2")


def pack_affine_host(points) -> tuple:
    """list of affine ((x0,x1),(y0,y1)) | None -> ((x...),(y...),inf)."""
    xs, ys, inf = [], [], []
    for p in points:
        if p is None:
            xs.append((0, 0)); ys.append((0, 0)); inf.append(True)
        else:
            xs.append(p[0]); ys.append(p[1]); inf.append(False)
    return (fq2.to_mont_host(xs), fq2.to_mont_host(ys),
            np.asarray(inf, bool)[:, None])


def pack_jacobian_host(points):
    x, y, inf = pack_affine_host(points)
    n = x[0].shape[0]
    z0 = np.broadcast_to(np.asarray(FQ.one_mont), (n, L.N_LIMBS)).copy()
    z0[inf[:, 0]] = 0
    z1 = np.zeros((n, L.N_LIMBS), np.uint32)
    return ((jnp.asarray(x[0]), jnp.asarray(x[1])),
            (jnp.asarray(y[0]), jnp.asarray(y[1])),
            (jnp.asarray(z0), jnp.asarray(z1)))


def to_affine_host(p) -> list:
    X = fq2.from_mont_host(p[0])
    Y = fq2.from_mont_host(p[1])
    Z = fq2.from_mont_host(p[2])
    out = []
    for x, y, z in zip(X, Y, Z):
        if z == (0, 0):
            out.append(None)
        else:
            zinv = ref.fq2_inv(z)
            zi2 = ref.fq2_sqr(zinv)
            out.append((ref.fq2_mul(x, zi2),
                        ref.fq2_mul(ref.fq2_mul(y, zi2), zinv)))
    return out
