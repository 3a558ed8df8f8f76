"""Multi-scalar multiplication (Pippenger) for BN254 G1/G2 on TPU.

Replaces websnark's sequential WASM multiexp over the proving-key tables
A/B1/B2/C/hExps (SURVEY §2.4 row 1, §3.3) with a fully-parallel scheme
shaped for XLA rather than a CPU translation:

  windows    c-bit digit decomposition of every scalar
  bucketing  there is no efficient data-dependent scatter-ADD of curve
             points on TPU, so digits are SORTED and equal-digit runs are
             reduced with a pairwise "run-merge" tree (one point add per
             node pair per level, total adds = n per window); the tree
             runs entirely in AFFINE coordinates — every level's adds
             share one batched inversion (weierstrass.batch_inverse, a
             work-efficient product tree), so a unified add costs ~6-7
             field muls instead of ~23 for the branch-free Jacobian add
  reduction  weighted bucket sum  sum_b b*S_b = reduce_j(exclusive suffix
             scan of buckets) — one work-efficient Blelloch scan + one
             pairwise reduction, ~3B Jacobian adds per window
  combine    Horner over windows: c doublings + 1 add per window
             (or on the host — 13 tiny point ops — via window_sums)

ALL windows are processed as ONE flat problem: one batched row-sort
(lax.sort over the (W, n) digit matrix), one gather, and one merge tree
over the flattened (W*n) array whose keys carry the window id in the high
bits so no run crosses a window boundary. Compared to looping windows
(lax.map), the tree's tail levels run at width W*2^k instead of 2^k, so
the VPU stays saturated ~log2(W) levels longer — measured 2x on the
bucket phase at 2^17 points.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import limbs as L
from ..curve.weierstrass import JacobianCurve, affine_add_batch


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


def _add_2d(curve: JacobianCurve, p, q, addfn=None, pad_pow2=False):
    """curve.add (or `addfn`) with leaves flattened to 2D (batch, 16) so
    big batches hit the fused Pallas kernel regardless of the logical
    leading shape.

    pad_pow2=True pads the flattened batch to the next power of two
    (zeros = infinity lanes, result sliced off). The reduction trees call
    their add at ~log2(n) DIFFERENT widths; each distinct width is a
    separate Mosaic kernel compile, so collapsing widths onto the power-
    of-two ladder makes all tree levels (across all trees in a program)
    share a handful of compiled kernels — at <2x extra lanes on a
    geometric series whose total is small."""
    fn = addfn if addfn is not None else curve.add
    leaves = jax.tree_util.tree_leaves(p)
    shape = leaves[0].shape
    flat = lambda a: a.reshape(-1, a.shape[-1])
    if len(shape) != 2:
        p = _tree(flat, p)
        q = _tree(flat, q)
    w = jax.tree_util.tree_leaves(p)[0].shape[0]
    w_pad = 1 << max((w - 1).bit_length(), 0) if pad_pow2 else w
    if w_pad != w:
        padz = lambda a: jnp.concatenate(
            [a, jnp.zeros((w_pad - w,) + a.shape[1:], a.dtype)], axis=0)
        out = fn(_tree(padz, p), _tree(padz, q))
        out = _tree(lambda a: a[:w], out)
    else:
        out = fn(p, q)
    if len(shape) != 2:
        out = _tree(lambda a: a.reshape(shape), out)
    return out


def _interleave_axis1(a, b):
    return _tree(
        lambda l, r: jnp.stack([l, r], axis=2).reshape(
            l.shape[:1] + (l.shape[1] * 2,) + l.shape[2:]), a, b)


def _excl_prefix_scan_axis1(curve, pts, return_total=False, addfn=None):
    """Work-efficient (Blelloch) EXCLUSIVE prefix point-sum along axis 1 of
    (W, B, ...) leaves: 2(B-1) adds per window vs B*log B for Hillis-Steele.
    Point addition is abelian, so the up/down-sweep restructuring is valid.
    With return_total, also returns the per-window full sum (the up-sweep
    root, free)."""
    levels = []
    cur = pts
    while jax.tree_util.tree_leaves(cur)[0].shape[1] > 1:
        levels.append(cur)
        cur = _add_2d(curve,
                      _tree(lambda a: a[:, 0::2], cur),
                      _tree(lambda a: a[:, 1::2], cur), addfn,
                      pad_pow2=True)
    total = _tree(lambda a: a[:, 0], cur)
    w = jax.tree_util.tree_leaves(cur)[0].shape[0]
    excl = curve.infinity((w, 1))
    for lvl in reversed(levels):
        left = _tree(lambda a: a[:, 0::2], lvl)
        excl_r = _add_2d(curve, excl, left, addfn, pad_pow2=True)
        excl = _interleave_axis1(excl, excl_r)
    if return_total:
        return excl, total
    return excl


def _excl_prefix_chunked_axis1(curve, pts, distinct: bool):
    """Lazy exclusive prefix point-scan along axis 1 of (W, n, ...) leaves
    whose elements have Z in {0, 1} (affine-or-infinity — the sorted,
    gathered table points). Returns (within, chunk_excl, total) with

        prefix_excl[w, q*K + k] == chunk_excl[w, q] (+) within[k, w, q]

    left LAZY (callers combine only the boundary positions they gather).
    Work: n - n/K mixed adds (the sequential chunk leg, ONE compiled madd
    body run K-1 times) + 2(n/K) Jacobian adds (Blelloch over chunk
    totals) per window — vs 2n full-width Jacobian adds for the eager
    Blelloch scan. distinct=True applies the no-double-path kernel
    contract (see weierstrass.add_nd)."""
    W, n = jax.tree_util.tree_leaves(pts)[0].shape[:2]
    K = min(CHUNK, n)
    nq = n // K
    # (W, n) -> (K, W, nq): chunk q covers positions [q*K, (q+1)*K)
    p3 = _tree(
        lambda a: jnp.moveaxis(
            a.reshape((W, nq, K) + a.shape[2:]), 2, 0), pts)
    x0 = _tree(lambda a: a[0], p3)
    rest = _tree(lambda a: a[1:], p3)

    def step(acc, x):
        new = _madd_2d(curve, acc, x, distinct)
        return new, acc

    # carry starts at x0 (Z in {0,1} is a valid Jacobian encoding): the
    # first add against infinity is skipped entirely
    totals, ys = jax.lax.scan(step, x0, rest)
    within = _tree(
        lambda i, y: jnp.concatenate([i[None], y], axis=0),
        curve.infinity((W, nq)), ys)          # (K, W, nq)

    # the Blelloch over chunk totals needs a power-of-two width — pad
    # HERE (cheap: nq elements) instead of padding the full column space
    # (n needs only be a multiple of K, so packed multi-table problems
    # avoid up to 2x column blow-up)
    nq_pad = 1 << max((nq - 1).bit_length(), 0)
    totals_p = totals
    if nq_pad != nq:
        totals_p = jax.tree_util.tree_map(
            lambda a, i: jnp.concatenate([a, i], axis=1), totals,
            curve.infinity((W, nq_pad - nq)))
    # SAFE adds for the Blelloch over chunk totals even in distinct mode:
    # chunk totals are sums over different column ranges, and with MULTI-
    # TABLE packing those can be EQUAL points systematically — a squaring
    # constraint (t, t, t2) gives var t2 identical A- and B1-columns, so
    # the a and b1 tables share thousands of points, and zero-digit
    # regions sort them into aligned runs (caught as an invalid device
    # proof at (2,6); the distinct contract only holds WITHIN a sorted
    # same-key run, i.e. for the sequential scan leg)
    chunk_excl, total = _excl_prefix_scan_axis1(
        curve, totals_p, return_total=True)
    if nq_pad != nq:
        chunk_excl = _tree(lambda a: a[:, :nq], chunk_excl)
    return within, chunk_excl, total


def _madd_2d(curve, p, q, distinct):
    """curve.madd_z01 on arbitrarily-shaped leading axes."""
    leaves = jax.tree_util.tree_leaves(p)
    shape = leaves[0].shape
    if len(shape) == 2:
        return curve.madd_z01(p, q, distinct=distinct)
    flat = lambda a: a.reshape(-1, a.shape[-1])
    out = curve.madd_z01(_tree(flat, p), _tree(flat, q), distinct=distinct)
    return _tree(lambda a: a.reshape(shape), out)


def _reduce_axis1(curve, pts):
    """Pairwise log-depth point-sum along axis 1 -> leaves (W, ...)."""
    cur = pts
    while jax.tree_util.tree_leaves(cur)[0].shape[1] > 1:
        cur = _add_2d(curve,
                      _tree(lambda a: a[:, 0::2], cur),
                      _tree(lambda a: a[:, 1::2], cur), pad_pow2=True)
    return _tree(lambda a: a[:, 0], cur)


# Bucket-phase strategy:
#   "scan"      scatter-free Abel summation via the CHUNKED lazy prefix
#               scan (default): sequential lax.scan over K-element chunks
#               of the sorted points (mixed adds: the incoming operand is
#               always affine-or-infinity) + a small Blelloch scan over
#               chunk totals + lazily-combined boundary gathers — ~n(1+2/K)
#               point adds per window vs the full Blelloch's 2n, and the
#               scan body compiles ONCE instead of 2*log2(n) unrolled
#               levels. See _flat_window_sums_scan2.
#   "scan1"     the round-4 full-Blelloch suffix scan (kept as a
#               differential reference for the chunked path)
#   "jacobian"  run-merge tree, branch-free Jacobian adds through the
#               fused Pallas kernels, scatter-banked buckets
#   "affine"    run-merge tree, all-affine nodes sharing one batched
#               inversion per level (fewest muls; loses on TPU to kernel
#               fusion + scatter costs)
# Differentially equal; benchmarked per backend (tools/profile_msm.py).
_TREE_MODE = os.environ.get("ZKROLLUP_MSM_TREE", "scan")
if _TREE_MODE not in ("scan", "scan1", "affine", "jacobian"):
    raise ValueError(
        f"ZKROLLUP_MSM_TREE={_TREE_MODE!r}: must be 'scan', 'scan1', "
        "'affine' or 'jacobian'. Read once at import (jit-cached programs "
        "bake the choice in); set it before importing zkrollup.")

# chunk length of the sequential scan leg; the adds overhead vs a perfect
# n-add scan is 2/K (the Blelloch over chunk totals). 128 beat 64 by ~8%
# at 2^17/c=12 on chip (round-5 sweep, tools/msm_sweep.py); 64 remains
# fine on small/test shapes.
CHUNK = int(os.environ.get("ZKROLLUP_MSM_CHUNK", "128"))


def _flat_window_sums_scan(curve: JacobianCurve, digits, xy, inf, c: int):
    """Scatter-free window sums via Abel summation over sorted digits.

        sum_i d_i*P_i  =  sum_{t=1}^{B-1}  T_t,   T_t = sum_{i: d_i >= t} P_i

    With each window's points sorted ascending by digit, every T_t is a
    single node of the suffix prefix-sum: T_t = R_{j_t} where j_t is the
    first sorted position with digit >= t (a searchsorted, no point math).
    Pipeline: one batched row-sort + gather, one work-efficient Blelloch
    scan along the sorted axis (2n adds/window), a (W, B-1) gather of scan
    nodes, and a log-depth reduction (B adds/window). No scatters at all —
    XLA:TPU lowers data-dependent scatter to sequential updates, which is
    where the banked run-merge tree spent most of its time (~1s per 2^17
    MSM measured; tools/profile_msm.py)."""
    W, n = digits.shape
    B = 1 << c
    F = curve.F

    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (W, n))
    d_sorted, perm = jax.lax.sort((digits, iota), dimension=1, num_keys=1)
    idx = perm.reshape(-1)
    p_xy = _tree(lambda a: jnp.take(a, idx, axis=0), xy)
    inf_f = jnp.take(inf, idx, axis=0)
    bshape = F.batch_shape(p_xy[0])
    z = F.select(inf_f, F.zeros(bshape), F.one(bshape))
    p = _tree(lambda a: a.reshape((W, n) + a.shape[1:]),
              (p_xy[0], p_xy[1], z))

    # exclusive suffix sums: reverse + exclusive prefix scan; the up-sweep
    # root is the per-window total (j == 0 case) for free
    rev = _tree(lambda a: jnp.flip(a, axis=1), p)
    excl_rev, total = _excl_prefix_scan_axis1(curve, rev, return_total=True)

    # j_t = searchsorted(row, t): inclusive suffix R_{j} = excl_rev[n - j];
    # n - j == 0 -> no elements (infinity), n - j == n -> every element
    ts = jnp.arange(1, B, dtype=d_sorted.dtype)
    j = jax.vmap(lambda row: jnp.searchsorted(row, ts))(d_sorted)
    i_idx = (n - j).astype(jnp.int32)                  # (W, B-1)
    rows = jnp.arange(W, dtype=jnp.int32)[:, None]
    safe = jnp.clip(i_idx, 0, n - 1)
    gathered = _tree(lambda a: a[rows, safe], excl_rev)
    total_b = _tree(
        lambda a: jnp.broadcast_to(a[:, None],
                                   (W, B - 1) + a.shape[1:]), total)
    sel = curve.select((i_idx == n)[..., None], total_b, gathered)
    sel = curve.select((i_idx == 0)[..., None], curve.infinity((W, B - 1)),
                       sel)
    # pad the B-1 thresholds to B (power of two) and reduce per window
    padded = jax.tree_util.tree_map(
        lambda a, i: jnp.concatenate([a, i], axis=1), sel,
        curve.infinity((W, 1)))
    return _reduce_axis1(curve, padded)


def _flat_window_sums_scan2(curve: JacobianCurve, keys, xy, inf, c: int,
                            n_tables: int, distinct: bool):
    """Chunked-scan Abel summation over n_tables CONCATENATED point tables
    (the Groth16 prove path fuses its four G1 key tables into ONE of these
    programs — VERDICT r4 #1).

    keys: (W, N) uint32, column j carrying (table_id << c) | digit so a
    row-sort groups (table, digit) runs; xy/inf: the concatenated points.
    For table t and threshold s, Abel summation over the table's slice is

        wsum[t, w] = sum_{s=1}^{B-1} T_{t,w,s},
        T_{t,w,s}  = R(j_{t,s}) (-) R(end_t)

    where R(i) = sum of the last i sorted points of row w (a suffix
    spanning LATER tables too — hence the subtraction of the suffix at the
    table's end; for the last table R(end) is infinity and the subtraction
    is a no-op add). All R values come from ONE chunked lazy prefix scan
    (n(1+2/K) adds/window); no scatters anywhere. Returns the per-window
    sums as a pytree with leading axes (W, n_tables)."""
    W, N = keys.shape
    B = 1 << c
    F = curve.F

    iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (W, N))
    k_sorted, perm = jax.lax.sort((keys, iota), dimension=1, num_keys=1)
    idx = perm.reshape(-1)
    # zero the coordinates of infinity rows (cheap, width N) so the mask
    # can be DERIVED after the big (W*N) gather instead of gathered —
    # x == y == 0 is impossible for a real point (y = 0 never occurs on
    # an odd-order curve), so zeros uniquely encode infinity
    zero16 = lambda a: jnp.where(inf != 0, jnp.zeros_like(a), a)
    if isinstance(xy[0], tuple):
        # G2: Fq2 coordinates — interleave all four limb blocks into ONE
        # (N, 64) array so the per-window reorder is a single wide-row
        # gather (chip-measured 2.6x faster than split gathers)
        packed = jnp.concatenate(
            [zero16(c) for c in (xy[0][0], xy[0][1], xy[1][0], xy[1][1])],
            axis=1)
        g = jnp.take(packed, idx, axis=0)
        x = (g[:, :16], g[:, 16:32])
        y = (g[:, 32:48], g[:, 48:64])
    else:
        packed = jnp.concatenate([zero16(xy[0]), zero16(xy[1])],
                                 axis=1)                    # (N, 32)
        g = jnp.take(packed, idx, axis=0)
        x, y = g[:, :16], g[:, 16:]
    inf_f = jnp.all(g == 0, axis=1, keepdims=True)
    bshape = F.batch_shape(x)
    z = F.select(inf_f, F.zeros(bshape), F.one(bshape))
    p = _tree(lambda a: a.reshape((W, N) + a.shape[1:]), (x, y, z))

    # lazy exclusive prefix over the REVERSED rows: R(i) = prefix_excl[i]
    rev = _tree(lambda a: jnp.flip(a, axis=1), p)
    within, chunk_excl, total = _excl_prefix_chunked_axis1(
        curve, rev, distinct)
    K = jax.tree_util.tree_leaves(within)[0].shape[0]

    # thresholds, table-major: for table t the B-1 Abel cut-offs then the
    # table-end marker (t+1)<<c  ->  (n_tables * B,)
    ts = jnp.concatenate([
        jnp.concatenate([
            jnp.arange(1, B, dtype=keys.dtype) + jnp.uint32(t << c),
            jnp.asarray([(t + 1) << c], keys.dtype)])
        for t in range(n_tables)])
    j = jax.vmap(lambda row: jnp.searchsorted(row, ts))(k_sorted)
    i_idx = (N - j).astype(jnp.int32)                 # (W, n_tables*B)
    rows = jnp.arange(W, dtype=jnp.int32)[:, None]
    safe = jnp.clip(i_idx, 0, N - 1)
    q_idx = safe // K
    k_idx = safe % K
    cpart = _tree(lambda a: a[rows, q_idx], chunk_excl)
    wpart = _tree(lambda a: a[k_idx, rows, q_idx], within)
    # safe add: chunk-prefix and within-chunk-prefix of a multi-table row
    # can coincide as points (see _excl_prefix_chunked_axis1 note)
    gathered = _add_2d(curve, cpart, wpart)
    total_b = _tree(
        lambda a: jnp.broadcast_to(
            a[:, None], (W, n_tables * B) + a.shape[1:]), total)
    sel = curve.select((i_idx == N)[..., None], total_b, gathered)
    sel = curve.select((i_idx == 0)[..., None],
                       curve.infinity((W, n_tables * B)), sel)

    # (W, T, B): [:, :, :B-1] are the Abel suffix values, [:, :, B-1] the
    # table-end suffix to subtract (negate y); the subtraction operands are
    # sums over ranges where one CONTAINS the other, so equality means an
    # empty middle — exactly the H==0, R!=0 -> infinity path, double-free
    sel3 = _tree(lambda a: a.reshape((W, n_tables, B) + a.shape[2:]), sel)
    svals = _tree(lambda a: a[:, :, :B - 1], sel3)
    end = _tree(lambda a: a[:, :, B - 1:], sel3)
    end_neg = (end[0], F.neg(end[1]), end[2])
    end_b = _tree(
        lambda a: jnp.broadcast_to(a, (W, n_tables, B - 1) + a.shape[3:]),
        end_neg)
    # subtraction operands are nested suffix sums: equality means an empty
    # middle and identical lazy representations, which the no-double
    # kernel resolves exactly (H = 0, R != 0 -> infinity) — but play safe
    # here too; the cost is one add over (W, T*(B-1)) lanes
    t_vals = _add_2d(curve, svals, end_b)

    # per-(table, window) reduction: pad B-1 -> B; adjacent T values ARE
    # equal whenever a digit goes unused, so this stays on the safe add
    padded = jax.tree_util.tree_map(
        lambda a, i: jnp.concatenate([a, i], axis=2), t_vals,
        curve.infinity((W, n_tables, 1)))
    flat = _tree(lambda a: a.reshape((W * n_tables, B) + a.shape[3:]),
                 padded)
    red = _reduce_axis1(curve, flat)
    return _tree(lambda a: a.reshape((W, n_tables) + a.shape[1:]), red)


def _flat_window_sums(curve: JacobianCurve, digits, xy, inf, c: int,
                      distinct: bool = False):
    """Bucket-accumulate and reduce ALL windows at once.

    digits: (W, n) uint32, n a power of two; xy: affine coordinate pytree
    with leaves (n, ...); inf: (n, 1) bool/int mask. Returns the per-window
    sums sum_b b*S_{w,b} as a Jacobian pytree with leading axis W.

    Work-efficient segmented reduce over the sorted digit runs via a
    pairwise "run-merge" tree: each node tracks its leftmost run
    (key ld, sum lv — may extend into earlier nodes), rightmost run
    (rd, rv), and whether the node is a single run (`whole`). Merging two
    nodes costs ONE point add (the bridge across the boundary); any run
    that closes is scattered into the (W*2^c) bucket array. Total
    point-adds = W*n; the tree runs log2(n) levels down to W root nodes
    (window boundaries align with node boundaries by construction), whose
    leftover runs are banked vectorized.
    """
    if _TREE_MODE == "scan":
        out = _flat_window_sums_scan2(curve, digits, xy, inf, c,
                                      n_tables=1, distinct=distinct)
        return _tree(lambda a: a[:, 0], out)
    if _TREE_MODE == "scan1":
        return _flat_window_sums_scan(curve, digits, xy, inf, c)

    W, n = digits.shape
    assert n & (n - 1) == 0, "msm: pad point count to a power of two"
    log_n = n.bit_length() - 1
    B = 1 << c
    NB = W * B
    F = curve.F

    # one batched row-sort of the digit matrix; payload = original index
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (W, n))
    d_sorted, perm = jax.lax.sort((digits, iota), dimension=1, num_keys=1)
    # key = (window << c) | digit: runs can never span window boundaries
    keys = (d_sorted
            + (jnp.arange(W, dtype=jnp.uint32) << c)[:, None]).reshape(-1)
    idx = perm.reshape(-1)                          # (W*n,) in [0, n)

    sentinel = jnp.uint32(NB)
    dig_mask = jnp.uint32(B - 1)

    def close_idx(mask, key):
        # digit 0 is never banked (contributes nothing)
        return jnp.where(mask & ((key & dig_mask) != 0), key, sentinel)

    if _TREE_MODE == "affine":
        bk = _run_merge_tree_affine(curve, xy, inf, keys, idx,
                                    W, n, log_n, B, NB, close_idx)
    else:
        bk = _run_merge_tree_jacobian(curve, xy, inf, keys, idx,
                                      W, n, log_n, B, NB, close_idx)

    # weighted sum per window: sum_b b*S_b = sum_j (sum_{b>j} S_b), i.e.
    # the plain reduction of the EXCLUSIVE suffix scan — one Blelloch scan
    # + one pairwise reduction, ~3B adds vs 2cB for two Hillis-Steele scans.
    flipped = _tree(lambda a: jnp.flip(a, axis=1), bk)
    excl_suffix = _excl_prefix_scan_axis1(curve, flipped)
    return _reduce_axis1(curve, excl_suffix)      # (W, ...)


def _run_merge_tree_affine(curve, xy, inf, keys, idx, W, n, log_n, B, NB,
                           close_idx):
    """Run-merge tree in AFFINE coordinates: every level's bridge adds
    share one batched inversion (weierstrass.affine_add_batch, ~6-7 field
    muls per add). Fewest muls; many small ops. Returns (W, B) Jacobian
    bucket pytree."""
    F = curve.F
    x, y = _tree(lambda a: jnp.take(a, idx, axis=0), xy)
    inf_f = jnp.take(inf, idx, axis=0) != 0         # (W*n, 1) bool
    p = (x, y, inf_f)

    def sel3(cond, a, b):
        return (F.select(cond, a[0], b[0]), F.select(cond, a[1], b[1]),
                jnp.where(cond, a[2], b[2]))

    def slice3(t, sl):
        return (_tree(lambda a: a[sl], t[0]), _tree(lambda a: a[sl], t[1]),
                t[2][sl])

    # affine bucket accumulators: coordinates + infinity flags (init inf)
    zero_like = lambda a: jnp.zeros((NB,) + a.shape[1:], a.dtype)
    bx = _tree(zero_like, x)
    by = _tree(zero_like, y)
    binf = jnp.ones((NB, 1), bool)

    def scatter_set(bks, bidx, vals):
        bx, by, binf = bks
        vx, vy, vinf = vals
        bx = _tree(lambda bk, v: bk.at[bidx].set(v, mode="drop"), bx, vx)
        by = _tree(lambda bk, v: bk.at[bidx].set(v, mode="drop"), by, vy)
        binf = binf.at[bidx].set(vinf, mode="drop")
        return (bx, by, binf)

    buckets = (bx, by, binf)

    # leaf nodes: every element is a whole single-element run
    lv = rv = p
    ld = rd = keys
    whole = jnp.ones((W * n,), bool)

    for lvl in range(log_n):
        a_lv = slice3(lv, slice(0, None, 2)); b_lv = slice3(lv, slice(1, None, 2))
        a_rv = slice3(rv, slice(0, None, 2)); b_rv = slice3(rv, slice(1, None, 2))
        a_ld, b_ld = ld[0::2], ld[1::2]
        a_rd, b_rd = rd[0::2], rd[1::2]
        a_wh, b_wh = whole[0::2], whole[1::2]

        merge = a_rd == b_ld
        # the one affine add per pair (shared batched inversion)
        bridge = affine_add_batch(curve, a_rv, b_lv)

        emit_a = (~merge) & (~a_wh)           # A's right run closes
        emit_b = (~merge) & (~b_wh)           # B's left run closes
        emit_m = merge & (~a_wh) & (~b_wh)    # bridged interior run closes
        buckets = scatter_set(buckets, close_idx(emit_a, a_rd), a_rv)
        buckets = scatter_set(buckets, close_idx(emit_b, b_ld), b_lv)
        buckets = scatter_set(buckets, close_idx(emit_m, a_rd), bridge)

        m2 = (merge)[:, None]
        lv = sel3(jnp.logical_and(m2, a_wh[:, None]), bridge, a_lv)
        rv = sel3(jnp.logical_and(m2, b_wh[:, None]), bridge, b_rv)
        ld, rd = a_ld, b_rd
        whole = a_wh & b_wh & merge

    # W root nodes, one per window: leftmost run closes; rightmost too
    # unless it IS the leftmost
    buckets = scatter_set(buckets, close_idx(jnp.ones((W,), bool), ld), lv)
    buckets = scatter_set(buckets, close_idx(~whole, rd), rv)

    # lift buckets to Jacobian (z = 0 for infinity, 1 otherwise)
    bx, by, binf = buckets
    bshape = F.batch_shape(bx)
    bz = F.select(binf, F.zeros(bshape), F.one(bshape))
    return _tree(lambda a: a.reshape((W, B) + a.shape[1:]), (bx, by, bz))


def _run_merge_tree_jacobian(curve, xy, inf, keys, idx, W, n, log_n, B, NB,
                             close_idx):
    """Run-merge tree in JACOBIAN coordinates: bridge adds are branch-free
    unified adds that dispatch to the fused VMEM Pallas kernels on TPU
    (pallas_curve.g1_add / g1_add_z01 at the leaf level). More field muls
    than the affine tree but each add is ONE kernel with zero intermediate
    HBM traffic — wins when dispatch/bandwidth dominate. Returns (W, B)
    Jacobian bucket pytree."""
    F = curve.F
    # gather affine coords only (z is synthesized: 1/3 less gather traffic)
    p_xy = _tree(lambda a: jnp.take(a, idx, axis=0), xy)
    inf_f = jnp.take(inf, idx, axis=0)              # (W*n, 1)
    bshape = F.batch_shape(p_xy[0])
    z = F.select(inf_f, F.zeros(bshape), F.one(bshape))
    x, y = p_xy
    p = (x, y, z)

    def scatter_set(buckets, bidx, vals):
        return _tree(
            lambda bk, v: bk.at[bidx].set(v, mode="drop"), buckets, vals)

    buckets = _tree(lambda a: jnp.zeros((NB,) + a.shape[1:], a.dtype), p)

    # leaf nodes: every element is a whole single-element run
    lv = rv = p
    ld = rd = keys
    whole = jnp.ones((W * n,), bool)

    for lvl in range(log_n):
        a_lv = _tree(lambda t: t[0::2], lv); b_lv = _tree(lambda t: t[1::2], lv)
        a_rv = _tree(lambda t: t[0::2], rv); b_rv = _tree(lambda t: t[1::2], rv)
        a_ld, b_ld = ld[0::2], ld[1::2]
        a_rd, b_rd = rd[0::2], rd[1::2]
        a_wh, b_wh = whole[0::2], whole[1::2]

        merge = a_rd == b_ld
        # the one add per pair; at the leaf level both operands are
        # affine-or-infinity (Z in {0,1}) -> ~1.9x cheaper specialized add
        if lvl == 0:
            bridge = curve.add_z01(a_rv, b_lv)
        else:
            bridge = curve.add(a_rv, b_lv)

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

    # W root nodes, one per window: leftmost run closes; rightmost too
    # unless it IS the leftmost
    buckets = scatter_set(buckets, close_idx(jnp.ones((W,), bool), ld), lv)
    buckets = scatter_set(buckets, close_idx(~whole, rd), rv)
    return _tree(lambda a: a.reshape((W, B) + a.shape[1:]), buckets)


def _pad_problem(points_affine, scalars):
    """Pad points+scalars to a power of two (scalar 0 / infinity points)."""
    x, y, inf = points_affine
    n = scalars.shape[0]
    n_pad = 1 << max((n - 1).bit_length(), 1)
    if n_pad != n:
        pad = n_pad - n
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((pad, L.N_LIMBS), jnp.uint32)], axis=0)
        x, y = _tree(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0), (x, y))
        inf = jnp.concatenate([inf, jnp.ones((pad, 1), inf.dtype)], axis=0)
    return (x, y, inf), scalars


def _clamp_window(c: int, n_sc: int) -> int:
    # clamp the window to the problem size: 2^c buckets are useless (and
    # costly in the bucket-reduction scans) beyond ~n buckets
    return max(2, min(c, max(n_sc.bit_length() - 1, 2)))


def window_sums(curve: JacobianCurve, points_affine, scalars: jnp.ndarray,
                c: int = 12, n_bits: int = 256, distinct: bool = False):
    """points_affine: (x, y, inf_mask) pytree, leaves (n, ...); scalars:
    (n, 16) plain-form limbs, each < 2^n_bits. Returns (wsum, c) where wsum
    is a Jacobian pytree with leading axis W = ceil(n_bits/c): the
    per-window bucket-weighted sums. Callers combine them with Horner —
    on device (msm) or on the host (msm/glv.py; W tiny point ops).

    distinct=True asserts the (non-infinity) POINTS are pairwise distinct
    — true of real proving-key tables — and unlocks the no-double-path
    kernels on TPU (see weierstrass.add_nd; ~30% fewer multiplies in the
    scan). With duplicated points it computes garbage: leave it False."""
    c = _clamp_window(c, scalars.shape[0])
    n_windows = (n_bits + c - 1) // c
    (x, y, inf), scalars = _pad_problem(points_affine, scalars)
    digits = window_digits(scalars, c, n_windows)  # (W, n_pad)
    return _flat_window_sums(curve, digits, (x, y), inf, c, distinct), c


def msm(curve: JacobianCurve, points_affine, scalars: jnp.ndarray,
        c: int = 12, n_bits: int = 256, distinct: bool = False):
    """Full MSM on device. Returns one Jacobian point (batch ())."""
    wsum, c = window_sums(curve, points_affine, scalars, c, n_bits, distinct)
    n_windows = jax.tree_util.tree_leaves(wsum)[0].shape[0]

    # Horner over windows, high to low: res = 2^c * res + W_w
    def horner(i, res):
        for _ in range(c):
            res = curve.double(res)
        w = _tree(lambda a: a[n_windows - 1 - i], wsum)
        return curve.add(res, w)

    res = curve.infinity(())
    return jax.lax.fori_loop(0, n_windows, horner, res)


_WS_JIT = {}


def _window_sums_jit(curve):
    """One cached jitted window_sums per curve object (JacobianCurve is an
    unhashable dataclass, so it can't be a static arg — close over it)."""
    f = _WS_JIT.get(id(curve))
    if f is None:
        f = jax.jit(partial(window_sums, curve),
                    static_argnames=("c", "n_bits", "distinct"))
        _WS_JIT[id(curve)] = f
    return f


def msm_host_combine(curve: JacobianCurve, points_affine, scalars,
                     c: int = 12, n_bits: int = 256, distinct: bool = False):
    """window_sums on device + Horner combine on the HOST (python-int
    Jacobian ops). The device Horner is ~290 batch-1 kernels inside the
    program — ~0.3s of pure dispatch at 2^17/c=12 on chip, vs <30ms on
    host (same trade the GLV path uses). G1 only (host ops are ref.g1_*);
    returns a device Jacobian point with (16,) leaves like msm()."""
    from .glv import combine_window_sums_host
    c = _clamp_window(c, scalars.shape[0])
    # the scope wraps the (first-call) trace of the jitted window_sums, so
    # G1 MSM kernel time attributes to this label in profiler traces
    # (tools/trace_prove.py) — the prove path's dominant cost
    with jax.named_scope("groth16.msm_g1"):
        wsum, _ = _window_sums_jit(curve)(tuple(points_affine), scalars,
                                          c=c, n_bits=n_bits,
                                          distinct=distinct)
    return combine_window_sums_host(wsum, c)


# -- fused multi-table MSM (the Groth16 G1 prove path) ------------------------

def pack_tables(tables):
    """Concatenate n point tables (x, y, inf) into one flat problem padded
    to CHUNK * 2^m columns. Returns (points (N,...), bounds [(start, len)]).
    Host-side, done once per proving key (prove.py caches the result)."""
    xs, ys, infs = [], [], []
    bounds = []
    start = 0
    for (x, y, inf) in tables:
        x, y, inf = np.asarray(x), np.asarray(y), np.asarray(inf)
        n_t = x.shape[0]
        bounds.append((start, n_t))
        xs.append(x); ys.append(y); infs.append(inf)
        start += n_t
    total = start
    # pad to a CHUNK multiple only — the chunked scan pads its (tiny)
    # chunk-totals array to a power of two itself, so the full column
    # space avoids up-to-2x power-of-two blow-up
    n_pad = -(-total // CHUNK) * CHUNK
    pad = n_pad - total
    if pad:
        xs.append(np.zeros((pad,) + xs[0].shape[1:], xs[0].dtype))
        ys.append(np.zeros((pad,) + ys[0].shape[1:], ys[0].dtype))
        infs.append(np.ones((pad,) + infs[0].shape[1:], infs[0].dtype))
    pts = (jnp.asarray(np.concatenate(xs)), jnp.asarray(np.concatenate(ys)),
           jnp.asarray(np.concatenate(infs)))
    return pts, bounds


def _multi_window_sums(curve, points, scalars_cat, c: int, bounds,
                       distinct: bool):
    """points: concatenated (x, y, inf) from pack_tables; scalars_cat:
    (N, 16) scalars aligned with the concatenation (zeros in padding).
    bounds: static ((start, len), ...). Returns (W, n_tables) window sums."""
    x, y, inf = points
    N = x.shape[0]
    n_tables = len(bounds)
    c = _clamp_window(c, max(l for _, l in bounds))
    n_windows = (256 + c - 1) // c
    digits = window_digits(scalars_cat, c, n_windows)      # (W, N)
    # column -> (table_id << c) key offset; padding keys stay in the last
    # table's range (digit 0, never gathered)
    off = np.zeros((N,), np.uint32)
    for t, (s, l) in enumerate(bounds):
        off[s:s + l] = np.uint32(t << c)
    if bounds:
        s_last, l_last = bounds[-1]
        off[s_last + l_last:] = np.uint32((n_tables - 1) << c)
    keys = digits + jnp.asarray(off)[None]
    return _flat_window_sums_scan2(curve, keys, (x, y), inf, c,
                                   n_tables, distinct), c


_MWS_JIT = {}


def _multi_window_sums_jit(curve):
    f = _MWS_JIT.get(id(curve))
    if f is None:
        f = jax.jit(partial(_multi_window_sums, curve),
                    static_argnames=("c", "bounds", "distinct"))
        _MWS_JIT[id(curve)] = f
    return f


def msm_multi_host_combine(curve, packed, bounds, scalars_cat,
                           c: int = 12, distinct: bool = True):
    """ONE compiled scan program for an MSM over every table in `packed`
    (from pack_tables), + per-table host Horner combines. Returns a list
    of host Jacobian results in table order. This is how the prover runs
    its four G1 MSMs: one sort, one scan, shared reduction tails."""
    from .glv import combine_window_sums_host
    c = _clamp_window(c, max(l for _, l in bounds))
    with jax.named_scope("groth16.msm_g1"):
        wsum, c = _multi_window_sums_jit(curve)(
            tuple(packed), scalars_cat, c=c, bounds=tuple(bounds),
            distinct=distinct)
    return [combine_window_sums_host(_tree(lambda a: a[:, t], wsum), c)
            for t in range(len(bounds))]
