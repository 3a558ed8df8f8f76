"""GLV endomorphism-accelerated G1 MSM for BN254.

BN254 has CM discriminant -3: the curve automorphism phi(x, y) = (beta*x, y)
with beta a primitive cube root of unity in Fq acts as multiplication by
lambda (a cube root of unity mod r) on G1. Every 254-bit scalar k splits as
k = k1 + k2*lambda with |k1|, |k2| < 2^128 (lattice Babai rounding), so the
MSM runs over twice the points with HALF the windows — ~2x fewer point adds
in the Pippenger bucket phase. websnark (the reference's multiexp engine,
SURVEY §2.4) does not implement GLV; this is TPU-budget headroom the
redesign banks.

Decomposition is host-side (native C++ zkh_glv_decompose, 4 mul128 chains
per scalar; scalars already in limb form skip the python-int round trip
entirely). The endomorphism table phi(P) is one Montgomery multiply per
point on device. The window combine (Horner over ~13 window sums) runs on
the HOST with python-int Jacobian ops: on device it is ~140 dispatch-bound
batch-1 kernels (~190ms measured); on host it is ~10^2 int muls (<1ms).
Differentially tested against the plain 256-bit MSM (tests/test_glv.py).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import limbs as L
from ..fields.mont import FQ
from ..ref import bn254 as ref
from ..ref.bn254 import R as FR_MOD
from ..curve import g1_jax
from .msm import window_sums, _clamp_window

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


def decompose_batch(scalars: Union[Sequence[int], np.ndarray]):
    """-> (abs_limbs (2n, 16) uint32, neg (2n, 1) bool). First n rows are
    k1 (for P), last n rows are k2 (for phi(P)). Accepts host ints (< r
    after reduction) or an (n, 16) uint32 limb array of canonical scalars
    (the fast path: no python-int packing at all). Dispatches to the native
    C++ engine (zkh_glv_decompose) when built."""
    from ..native import engine
    if isinstance(scalars, (np.ndarray, jnp.ndarray)):
        limbs = np.asarray(scalars, dtype=np.uint32)
        assert limbs.ndim == 2 and limbs.shape[1] == L.N_LIMBS
        if engine.available():
            return engine.glv_decompose_limbs(limbs)
        return decompose_batch_py(L.limbs_to_ints(limbs))
    if engine.available():
        return engine.glv_decompose_batch([k % FR_MOD for k in scalars])
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
def _glv_window_sums_device(points_affine, abs_scalars, neg, c: int):
    """points (n, ...) packed affine; abs_scalars (2n, 16); neg (2n, 1).
    Returns per-window Jacobian sums, leading axis W = ceil(130/c)."""
    x, y, inf = points_affine
    # endomorphism table: phi(P) = (beta * x, y)
    x2 = jnp.concatenate([x, FQ.mont_mul(x, _beta_mont())], axis=0)
    y2 = jnp.concatenate([y, y], axis=0)
    inf2 = jnp.concatenate([inf, inf], axis=0)
    # fold the decomposition signs into the points: -P = (x, -y)
    y2 = L.select(neg, FQ.neg(y2), y2)
    wsum, _ = window_sums(g1_jax.G1, (x2, y2, inf2), abs_scalars, c=c,
                          n_bits=GLV_BITS)
    return wsum


def combine_window_sums_host(wsum, c: int):
    """Horner-combine per-window Jacobian sums on the host.
    wsum: pytree with (W, 16) Montgomery-limb leaves (device or host).
    Returns a device Jacobian point with (16,) leaves (batch ())."""
    X = FQ.from_mont_host(np.asarray(wsum[0]))
    Y = FQ.from_mont_host(np.asarray(wsum[1]))
    Z = FQ.from_mont_host(np.asarray(wsum[2]))
    res = (0, 1, 0)
    for w in range(len(X) - 1, -1, -1):
        for _ in range(c):
            res = ref.g1_jac_double(res)
        res = ref.g1_jac_add(res, (X[w], Y[w], Z[w]))
    pack = lambda v: jnp.asarray(FQ.to_mont_host([v])[0])
    return (pack(res[0]), pack(res[1]), pack(res[2]))


def combine_multi_window_sums_host(wsum, c: int):
    """Horner-combine a fused multi-table window-sum block on the host.

    wsum: Jacobian pytree with (W, T, 16) Montgomery-limb leaves — the
    output of the packed multi-table MSM (msm_multi_host_combine's window
    stage). ONE device->host transfer per coordinate (eager per-table
    slicing costs ~40ms/dispatch on the axon tunnel — round-5 breakdown:
    1.47s for 4 tables the sliced way, ~20ms this way), then pure-python
    Horner per table. Returns a list of T host AFFINE points (x, y)|None —
    exactly what _blind_combine consumes."""
    xs, ys, zs = (np.asarray(wsum[i]) for i in range(3))
    W, T = xs.shape[0], xs.shape[1]
    Xs = FQ.from_mont_host(xs.reshape(-1, 16))
    Ys = FQ.from_mont_host(ys.reshape(-1, 16))
    Zs = FQ.from_mont_host(zs.reshape(-1, 16))
    out = []
    for t in range(T):
        res = (0, 1, 0)
        for w in range(W - 1, -1, -1):
            for _ in range(c):
                res = ref.g1_jac_double(res)
            res = ref.g1_jac_add(res, (Xs[w * T + t], Ys[w * T + t],
                                       Zs[w * T + t]))
        out.append(ref.g1_jac_to_affine(res))
    return out


# one stacked D2H transfer for a G2 window-sum pytree (6 leaves): eager
# per-leaf np.asarray syncs cost ~30ms each over the axon tunnel
_stack_leaves_jit = jax.jit(
    lambda t: jnp.stack(jax.tree_util.tree_leaves(t)))


def combine_window_sums_host_g2(wsum, c: int):
    """G2 Horner combine on the host: ~W*(c+1) single-point twist ops vs
    hundreds of dispatch-bound batch-1 Fq2 kernels on device. wsum: G2
    Jacobian pytree with ((W,16),(W,16)) Fq2 leaves. Returns a host affine
    point ((x0,x1),(y0,y1)) | None — the shape prove.py's blinding
    combine consumes."""
    from ..curve import g2_jax
    leaves = jax.tree_util.tree_leaves(wsum)
    if len(leaves) == 6 and all(
            l.shape == leaves[0].shape for l in leaves):
        flat = np.asarray(_stack_leaves_jit(wsum))       # ONE transfer
        wsum = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(wsum), list(flat))
    pts = g2_jax.to_affine_host(wsum)
    res = None
    for w in range(len(pts) - 1, -1, -1):
        if res is not None:
            res = ref.g2_mul(res, 1 << c)
        if pts[w] is not None:
            res = pts[w] if res is None else ref.g2_add(res, pts[w])
    return res


def msm_glv(points_affine, scalars, c: int = 10):
    """points_affine: packed (x, y, inf) device/host arrays; scalars: host
    ints OR an (n, 16) uint32 canonical limb array. Returns a Jacobian
    point with (16,) leaves (the same contract as msm.msm)."""
    if isinstance(scalars, (list, tuple)):
        scalars = list(scalars)
    abs_limbs, neg = decompose_batch(scalars)
    pa = tuple(jnp.asarray(a) for a in points_affine)
    c_eff = _clamp_window(c, abs_limbs.shape[0])
    wsum = _glv_window_sums_device(pa, jnp.asarray(abs_limbs),
                                   jnp.asarray(neg), c_eff)
    return combine_window_sums_host(wsum, c_eff)
