"""BN254 G1 batched point ops (Jacobian, Fq limbs) + host packing."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..fields.mont import FQ
from ..fields import limbs as L
from ..ref import bn254 as ref
from .weierstrass import JacobianCurve, FqOps

G1 = JacobianCurve(FqOps, fused="g1")


def pack_affine_host(points) -> tuple:
    """list of affine (x, y) | None -> (x_limbs, y_limbs, inf_mask) host
    arrays; mont form. Infinity packed as (0, 0, True)."""
    xs, ys, inf = [], [], []
    for p in points:
        if p is None:
            xs.append(0); ys.append(0); inf.append(True)
        else:
            xs.append(p[0]); ys.append(p[1]); inf.append(False)
    return (FQ.to_mont_host(xs), FQ.to_mont_host(ys),
            np.asarray(inf, bool)[:, None])


def pack_jacobian_host(points):
    """list of affine points -> batched Jacobian device-ready arrays."""
    x, y, inf = pack_affine_host(points)
    n = x.shape[0]
    z = np.broadcast_to(np.asarray(FQ.one_mont), (n, L.N_LIMBS)).copy()
    z[inf[:, 0]] = 0
    return (jnp.asarray(x), jnp.asarray(y), jnp.asarray(z))


def to_affine_host(p) -> list:
    """Batched Jacobian -> list of affine (x, y) | None, via host ints."""
    X = FQ.from_mont_host(np.asarray(p[0]))
    Y = FQ.from_mont_host(np.asarray(p[1]))
    Z = FQ.from_mont_host(np.asarray(p[2]))
    out = []
    for x, y, z in zip(X, Y, Z):
        if z == 0:
            out.append(None)
        else:
            zinv = pow(z, ref.Q - 2, ref.Q)
            zi2 = zinv * zinv % ref.Q
            out.append((x * zi2 % ref.Q, y * zi2 % ref.Q * zinv % ref.Q))
    return out
