"""Groth16 trusted setup, TPU-accelerated.

Replaces `snarkjs setup --protocol groth` (prover/package.json:35,38 in the
reference) and emits keys directly in the packed device layout (keys.py)
rather than snarkjs JSON + websnark binary. The heavy part — one fixed-base
scalar multiplication per table entry (~5 tables x n_vars/domain points) —
runs batched on TPU (msm/fixed_base.py); only the O(m) host field
arithmetic (Lagrange evaluation at tau) stays on CPU.

Determinism: pass `seed` to derive the toxic waste (tau, alpha, beta, gamma,
delta) from SHA-256 — same seed, same R1CS => bit-identical keys, which is
the cross-run/cross-host reproducibility gate (SURVEY §5 race-detection
obligation).
"""

from __future__ import annotations

import hashlib
import secrets
from typing import List, Optional

from ..ref import bn254 as ref
from ..ref.bn254 import R as FR_MOD
from .keys import ProvingKey, VerifyingKey, r1cs_digest
from .qap import eval_at_tau
from ..msm.fixed_base import g1_points_from_scalars, g2_points_from_scalars


def _derive_scalar(seed: bytes, tag: bytes, ctr: int = 0) -> int:
    while True:
        h = hashlib.sha512(seed + b"|" + tag + b"|" + ctr.to_bytes(4, "big"))
        v = int.from_bytes(h.digest(), "big") % FR_MOD
        if v > 1:
            return v
        ctr += 1


def setup(r1cs, seed: Optional[bytes] = None) -> ProvingKey:
    """R1CS -> ProvingKey (with embedded VerifyingKey)."""
    if seed is None:
        seed = secrets.token_bytes(32)

    alpha = _derive_scalar(seed, b"alpha")
    beta = _derive_scalar(seed, b"beta")
    gamma = _derive_scalar(seed, b"gamma")
    delta = _derive_scalar(seed, b"delta")
    ctr = 0
    while True:  # re-derive tau if it lands in the evaluation domain
        tau = _derive_scalar(seed, b"tau", ctr)
        try:
            a_t, b_t, c_t, m, z_tau = eval_at_tau(r1cs, tau)
            break
        except ValueError:
            ctr += 1

    npub = r1cs.n_public
    nv = r1cs.n_vars
    inv_delta = pow(delta, FR_MOD - 2, FR_MOD)
    inv_gamma = pow(gamma, FR_MOD - 2, FR_MOD)

    # per-variable table scalars
    k_scalars = [(beta * a_t[i] + alpha * b_t[i] + c_t[i]) % FR_MOD
                 for i in range(nv)]
    ic_scalars = [k_scalars[i] * inv_gamma % FR_MOD for i in range(npub)]
    c_scalars = [k_scalars[i] * inv_delta % FR_MOD for i in range(npub, nv)]
    # h table: tau^j * Z(tau) / delta, j = 0..m-2
    h_scalars: List[int] = [z_tau * inv_delta % FR_MOD] * (m - 1)
    for j in range(1, m - 1):
        h_scalars[j] = h_scalars[j - 1] * tau % FR_MOD

    # batched fixed-base MSMs on device (one concatenated G1 pass)
    all_g1 = a_t + b_t + c_scalars + h_scalars + ic_scalars
    x, y, inf = g1_points_from_scalars(all_g1)

    def cut(n):
        nonlocal x, y, inf
        part = (x[:n], y[:n], inf[:n])
        x, y, inf = x[n:], y[n:], inf[n:]
        return part

    a_g1 = cut(nv)
    b1_g1 = cut(nv)
    c_g1 = cut(nv - npub)
    h_g1 = cut(m - 1)
    ic_packed = cut(npub)
    b2_g2 = g2_points_from_scalars(b_t)

    # single points on host (cheap)
    g1m = lambda k: ref.g1_mul(ref.G1_GEN, k)
    g2m = lambda k: ref.g2_mul(ref.G2_GEN, k)
    from ..curve.g1_jax import to_affine_host as g1_unpack  # noqa: local use
    import numpy as np
    from ..fields.mont import FQ

    def unpack_ic(packed):
        px, py, pinf = packed
        xs = FQ.from_mont_host(np.asarray(px))
        ys = FQ.from_mont_host(np.asarray(py))
        return [None if i else (a, b)
                for a, b, i in zip(xs, ys, pinf[:, 0])]

    vk = VerifyingKey(alpha1=g1m(alpha), beta2=g2m(beta), gamma2=g2m(gamma),
                      delta2=g2m(delta), ic=unpack_ic(ic_packed))
    return ProvingKey(
        n_vars=nv, n_public=npub, domain_size=m,
        alpha1=g1m(alpha), beta1=g1m(beta), delta1=g1m(delta),
        beta2=g2m(beta), delta2=g2m(delta),
        a_g1=a_g1, b1_g1=b1_g1, b2_g2=b2_g2, c_g1=c_g1, h_g1=h_g1, vk=vk,
        r1cs_digest=r1cs_digest(r1cs))
