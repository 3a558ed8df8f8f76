"""Multi-scalar multiplication (Pippenger) for BN254 G1/G2 on TPU.

Replaces websnark's sequential WASM multiexp over the proving-key tables
A/B1/B2/C/hExps (SURVEY §2.4 row 1, §3.3) with a fully-parallel scheme
shaped for XLA rather than a CPU translation:

  windows    c-bit digit decomposition of every scalar
  bucketing  there is no efficient data-dependent scatter-ADD of curve
             points on TPU, so each window SORTS its digits and reduces
             equal-digit runs with a SEGMENTED Hillis-Steele scan whose
             step (one masked point-add over the whole window) lives in a
             fori_loop body — compiled ONCE, executed ceil(log2 n) times
  reduction  weighted bucket sum  sum_b b*S_b = sum_{j>=1} T_j with
             T = reverse cumulative point-sum of buckets — two more
             log-depth scans with body-once compilation
  combine    Horner over windows: c doublings + 1 add per window

Windows run under lax.map: one compiled window body, memory bounded to a
single window's gathered points; each window is a full-width batched
pipeline so the VPU stays saturated.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import limbs as L
from ..curve.weierstrass import JacobianCurve


def _tree(fn, *pts):
    return jax.tree_util.tree_map(fn, *pts)


def window_digits(scalars: jnp.ndarray, c: int, n_windows: int) -> jnp.ndarray:
    """scalars: (n, 16) plain-form limbs -> (n_windows, n) uint32 digits.
    Only the low n_windows*c bits are consumed — callers with short scalars
    (e.g. GLV halves, msm/glv.py) pass a smaller n_windows."""
    n = scalars.shape[0]
    shifts = jnp.arange(L.LIMB_BITS, dtype=jnp.uint32)
    bits = ((scalars[:, :, None] >> shifts) & 1).reshape(n, 256)  # lsb-first
    pad = n_windows * c - 256
    if pad > 0:
        bits = jnp.concatenate([bits, jnp.zeros((n, pad), jnp.uint32)], axis=1)
    digs = bits[:, :n_windows * c].reshape(n, n_windows, c)
    weights = (jnp.uint32(1) << jnp.arange(c, dtype=jnp.uint32))
    return jnp.sum(digs * weights, axis=-1, dtype=jnp.uint32).T  # (W, n)


def _shift_down(arr, d, fill=None):
    """arr[i - d] with i < d rows replaced by `fill` (or arr[0], unused when
    masked). d is traced. Leaves shape (n, ...)."""
    n = arr.shape[0]
    idx = jnp.maximum(jnp.arange(n, dtype=jnp.int32) - d, 0)
    return jnp.take(arr, idx, axis=0)


def _segment_scan(curve: JacobianCurve, heads, pts, log_n: int):
    """Segmented inclusive cumulative point-add over axis 0.
    heads: (n, 1) uint32, 1 at segment starts. pts: Jacobian pytree with
    leaves (n, ...). Returns scanned (flags, points)."""
    n = heads.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)[:, None]

    def step(k, carry):
        f, v = carry
        d = jnp.int32(1) << k
        f_sh = _shift_down(f, d)
        v_sh = _tree(lambda a: _shift_down(a, d), v)
        combined = curve.add(v_sh, v)
        # keep v where: position < d (nothing to the left), or own segment
        # already closed (flag set anywhere in (i-d, i] -> f[i] accumulated)
        take_own = jnp.logical_or(pos < d, f != 0)
        v_new = curve.select(take_own, v, combined)
        f_new = jnp.where(pos < d, f, f | f_sh)
        return (f_new, v_new)

    return jax.lax.fori_loop(0, log_n, step, (heads, pts))


def _cumulative_points(curve, pts, log_n, reverse=False):
    """Plain (unsegmented) cumulative point-add along axis 0."""
    leaves = jax.tree_util.tree_leaves(pts)
    n = leaves[0].shape[0]
    if reverse:
        pts = _tree(lambda a: jnp.flip(a, axis=0), pts)
    pos = jnp.arange(n, dtype=jnp.int32)[:, None]

    def step(k, v):
        d = jnp.int32(1) << k
        v_sh = _tree(lambda a: _shift_down(a, d), v)
        combined = curve.add(v_sh, v)
        return curve.select(pos < d, v, combined)

    out = jax.lax.fori_loop(0, log_n, step, pts)
    if reverse:
        out = _tree(lambda a: jnp.flip(a, axis=0), out)
    return out


def _window_bucket_sum(curve: JacobianCurve, digits_row, pts, c: int):
    """One window: digits (n,), pts leaves (n, ...) -> reduced point.

    Work-efficient segmented reduce over the SORTED digit runs via a
    pairwise "run-merge" tree: each node tracks its leftmost run
    (digit ld, sum lv — may extend into earlier nodes), rightmost run
    (rd, rv), and whether the node is a single run (`whole`). Merging two
    nodes costs ONE point add (the bridge across the boundary); any run
    that closes is scattered into the bucket array at that level. Total
    point-adds = n; graph = log2(n) add instances with halving widths.
    """
    n = digits_row.shape[0]
    assert n & (n - 1) == 0, "msm: pad point count to a power of two"
    log_n = n.bit_length() - 1
    B = 1 << c

    order = jnp.argsort(digits_row)
    d = jnp.take(digits_row, order)
    p = _tree(lambda a: jnp.take(a, order, axis=0), pts)

    def scatter_set(buckets, idx, vals):
        return _tree(
            lambda bk, v: bk.at[idx].set(v, mode="drop"), buckets, vals)

    buckets = _tree(
        lambda a: jnp.zeros((B,) + a.shape[1:], a.dtype), p)

    # leaf nodes: every element is a whole single-element run
    lv = rv = p
    ld = rd = d
    whole = jnp.ones((n,), bool)
    sentinel = jnp.uint32(B)

    def close_idx(mask, dig):
        # digit 0 is never banked (contributes nothing)
        return jnp.where(mask & (dig != 0), dig, sentinel)

    for _ in range(log_n):
        a_lv = _tree(lambda x: x[0::2], lv); b_lv = _tree(lambda x: x[1::2], lv)
        a_rv = _tree(lambda x: x[0::2], rv); b_rv = _tree(lambda x: x[1::2], rv)
        a_ld, b_ld = ld[0::2], ld[1::2]
        a_rd, b_rd = rd[0::2], rd[1::2]
        a_wh, b_wh = whole[0::2], whole[1::2]

        merge = a_rd == b_ld
        bridge = curve.add(a_rv, b_lv)  # the one add per pair

        emit_a = (~merge) & (~a_wh)           # A's right run closes
        emit_b = (~merge) & (~b_wh)           # B's left run closes
        emit_m = merge & (~a_wh) & (~b_wh)    # bridged interior run closes
        buckets = scatter_set(buckets, close_idx(emit_a, a_rd), a_rv)
        buckets = scatter_set(buckets, close_idx(emit_b, b_ld), b_lv)
        buckets = scatter_set(buckets, close_idx(emit_m, a_rd), bridge)

        m2 = (merge)[:, None]
        lv = curve.select(jnp.logical_and(m2, a_wh[:, None]), bridge, a_lv)
        rv = curve.select(jnp.logical_and(m2, b_wh[:, None]), bridge, b_rv)
        ld, rd = a_ld, b_rd
        whole = a_wh & b_wh & merge

    # root: leftmost run closes; rightmost too unless it IS the leftmost
    buckets = scatter_set(buckets, close_idx(jnp.ones((1,), bool), ld), lv)
    buckets = scatter_set(
        buckets, close_idx(~whole, rd), rv)

    # weighted sum: sum_b b*S_b = sum_{j>=1} T_j, T = reverse cumsum;
    # HS scans at bucket width: 2 add instances, work O(B log B) — tiny.
    suffix = _cumulative_points(curve, buckets, c, reverse=True)
    t = _tree(lambda a: a.at[0].set(jnp.zeros_like(a[0])), suffix)  # drop j=0
    total = _cumulative_points(curve, t, c, reverse=False)
    return _tree(lambda a: a[-1], total)


def msm(curve: JacobianCurve, points_affine, scalars: jnp.ndarray,
        c: int = 12, n_bits: int = 256):
    """points_affine: (x, y, inf_mask) pytree, leaves (n, ...); scalars:
    (n, 16) plain-form limbs, each < 2^n_bits. Returns one Jacobian point
    (batch ())."""
    # clamp the window to the problem size: 2^c buckets are useless (and
    # costly in the bucket-reduction scans) beyond ~n buckets
    n_sc = scalars.shape[0]
    c = max(2, min(c, max(n_sc.bit_length() - 1, 2)))
    n_windows = (n_bits + c - 1) // c

    x, y, inf = points_affine
    n = scalars.shape[0]
    n_pad = 1 << max((n - 1).bit_length(), 1)
    if n_pad != n:
        # pad with scalar 0 (digit 0 -> never banked) and infinity points
        pad = n_pad - n
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((pad, L.N_LIMBS), jnp.uint32)], axis=0)
        x, y = _tree(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0), (x, y))
        inf = jnp.concatenate([inf, jnp.ones((pad, 1), inf.dtype)], axis=0)

    digits = window_digits(scalars, c, n_windows)  # (W, n_pad)

    one_z = curve.F.one(curve.F.batch_shape(x))
    zero_z = curve.F.zeros(curve.F.batch_shape(x))
    z = curve.F.select(inf, zero_z, one_z)
    pts = (x, y, z)

    wsum = jax.lax.map(
        lambda dg: _window_bucket_sum(curve, dg, pts, c), digits)

    # Horner over windows, high to low: res = 2^c * res + W_w
    def horner(i, res):
        for _ in range(c):
            res = curve.double(res)
        w = _tree(lambda a: a[n_windows - 1 - i], wsum)
        return curve.add(res, w)

    res = curve.infinity(())
    return jax.lax.fori_loop(0, n_windows, horner, res)
