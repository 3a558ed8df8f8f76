"""Batched MiMCSponge over Fr for TPU — the rollup's universal hash.

Replaces the scalar JS hot loop the reference runs per tree update / leaf /
tx (SURVEY §3.1: `CircomLib.MiMCSponge` 220-round loop per hashPair;
`helpers.ts:80 hashBalanceTreeLeaf`) with a lane-parallel kernel: the
220-round Feistel runs as a lax.scan whose body is 3 Montgomery mults on a
whole batch of states at once. Hashing a full Merkle level of 2^19 pairs is
one kernel launch.

All values stay in the Montgomery domain between rounds; constants are
pre-encoded device arrays.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.mont import FR
from ..fields import limbs as L
from ..ref.mimc import mimcsponge_constants, N_ROUNDS_SPONGE


_CTS = None


def constants_mont() -> np.ndarray:
    """(220, 16) uint32 round constants in Montgomery form, as a HOST numpy
    array (device-agnostic; each jit trace captures it as a constant —
    caching a device array here would leak tracers)."""
    global _CTS
    if _CTS is None:
        cts = mimcsponge_constants(N_ROUNDS_SPONGE)
        _CTS = FR.to_mont_host(list(cts))
    return _CTS


def permute_mont(x_l: jnp.ndarray, x_r: jnp.ndarray, k: jnp.ndarray):
    """MiMC-Feistel permutation; inputs/outputs in Montgomery form.

    x_l, x_r: (..., 16); k broadcastable to (..., 16).
    """
    cts = jnp.asarray(constants_mont())

    def round_fn(state, c):
        xl, xr = state
        t = FR.add(FR.add(xl, k), c)
        t2 = FR.mont_mul(t, t)
        t4 = FR.mont_mul(t2, t2)
        t5 = FR.mont_mul(t4, t)
        # swap applies to all but the final round; the final round's
        # "no-swap" is fixed up by the caller swapping back once.
        return (FR.add(xr, t5), xl), None

    (xl, xr), _ = jax.lax.scan(round_fn, (x_l, x_r), cts)
    # scan applied swap on round 219 too; undo: real semantics leave
    # xL untouched in the last round and only set xR = xR + t5.
    return xr, xl


def multi_hash_mont(inputs: jnp.ndarray, k: jnp.ndarray | None = None) -> jnp.ndarray:
    """Sponge multi-hash. inputs: (..., n_in, 16) Montgomery form.
    Returns (..., 16) Montgomery form."""
    n_in = inputs.shape[-2]
    batch = inputs.shape[:-2]
    if k is None:
        k = jnp.zeros(batch + (L.N_LIMBS,), jnp.uint32)
    r = jnp.zeros(batch + (L.N_LIMBS,), jnp.uint32)
    c = jnp.zeros(batch + (L.N_LIMBS,), jnp.uint32)
    for i in range(n_in):  # n_in is small & static (2..8)
        r = FR.add(r, inputs[..., i, :])
        r, c = permute_mont(r, c, k)
    return r


@partial(jax.jit, static_argnames=())
def hash_pairs_mont(pairs: jnp.ndarray) -> jnp.ndarray:
    """(..., 2, 16) -> (..., 16), hashLeftRight over a batch (mont form)."""
    return multi_hash_mont(pairs)


def multi_hash_ints(values_2d) -> np.ndarray:
    """Host convenience: list of rows of ints -> np array of hash ints."""
    rows = list(values_2d)
    n = len(rows)
    width = len(rows[0])
    flat = [v for row in rows for v in row]
    enc = jnp.asarray(FR.to_mont_host(flat)).reshape(n, width, L.N_LIMBS)
    out = multi_hash_mont(enc)
    return np.asarray(FR.from_mont_host(np.asarray(out)))


def hash_balance_tree_leaves(leaves: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 16) [pubX, pubY, balance, nonce] -> leaf hashes (mont form).
    Parity: helpers.ts:80-82."""
    return multi_hash_mont(leaves)


def merkle_level_up(nodes: jnp.ndarray) -> jnp.ndarray:
    """One tree level: (n, 16) mont-form nodes (n even) -> (n//2, 16)."""
    return hash_pairs_mont(nodes.reshape(-1, 2, L.N_LIMBS))


def build_tree_root_mont(leaves: jnp.ndarray, depth: int) -> jnp.ndarray:
    """Root of a full 2^depth-leaf tree from mont-form leaves (n = 2^depth).

    Note: the rollup's incremental tree hashes `depth` levels above the leaf
    row (root = H over 2^depth leaves padded with zeros-tree values); this
    helper is the dense batched builder used for bulk rebuilds/benchmarks.
    """
    nodes = leaves
    for _ in range(depth):
        nodes = merkle_level_up(nodes)
    return nodes[0]
