"""Bulk Merkle-tree construction through the batched TPU MiMC kernel.

The incremental tree (merkle.py) hashes one leaf path at a time through
host MiMC — right for single deposits/updates (the reference's only mode,
merkletree.ts:125-227). Bulk flows — rebuilding an operator mirror from
stored leaves, integrity-checking a TreeStore snapshot, post-batch
rebuilds — hash whole levels at once instead: one `hash/mimc_jax.py`
kernel launch per level (2^k pairs per launch) rather than 2^k scalar
sponge loops.

`from_leaves` reproduces the EXACT object state `insert_` would have built
(zeros/filledSubtrees/filledPaths caches included), asserted by
`MerkleTree.equals` in tests/test_tree.py.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import numpy as np

from ..ref.mimc import multi_hash
from ..fields.mont import FR
from ..fields import limbs as L
from .merkle import MerkleTree

# below this many leaves the kernel launch + transfer overhead loses to the
# host loop (and tiny CPU-test trees skip XLA compiles entirely)
MIN_BATCH_LEAVES = 16


def _level_up_host(nodes: List[int]) -> List[int]:
    return [multi_hash([nodes[i], nodes[i + 1]])
            for i in range(0, len(nodes), 2)]


def _level_up_device(nodes: List[int]) -> List[int]:
    from ..hash import mimc_jax
    import jax.numpy as jnp
    enc = jnp.asarray(FR.to_mont_host(nodes))
    out = mimc_jax.merkle_level_up(enc)
    return list(FR.from_mont_host(np.asarray(out)))


def _level_up(nodes: List[int], use_device: bool) -> List[int]:
    if use_device and len(nodes) >= 2 * MIN_BATCH_LEAVES:
        return _level_up_device(nodes)
    return _level_up_host(nodes)


def from_leaves(leaves: Sequence[int], depth: int, zero_value: int = 0,
                leaves_raw: Optional[Sequence[Any]] = None,
                use_device: bool = True) -> MerkleTree:
    """Rebuild the tree `insert_`-ing each leaf would produce, but with
    batched level hashing: object state (root, caches, capacity quirk) is
    bit-identical to the incremental path."""
    n = len(leaves)
    tree = MerkleTree(depth, zero_value)
    if n + 1 > tree.max_leaf_index:
        raise ValueError("Tree at max capacity")
    if n == 0:
        return tree

    tree.leaves = list(leaves)
    tree.leaves_raw = (list(leaves_raw) if leaves_raw is not None
                       else [None] * n)
    tree.next_leaf_index = n

    # level 0 .. depth-1: nodes[i] holds the non-zero prefix of level i
    nodes = list(leaves)
    for i in range(depth):
        # pad to even with the level's zero value
        padded = nodes + ([tree.zeros[i]] if len(nodes) % 2 else [])
        # cache parity with sequential insert_ (merkle.py:100-123):
        #   filled_paths[i] holds every touched node: 0..len(padded)-1
        #   filled_subtrees[i] = the last EVEN-indexed node's value
        tree.filled_paths[i] = {j: padded[j] for j in range(len(padded))}
        last = (n - 1) >> i
        tree.filled_subtrees[i] = padded[last & ~1]
        nodes = _level_up(padded, use_device)

    tree.root = nodes[0]
    return tree


def multi_hash_rows(rows: Sequence[Sequence[int]],
                    use_device: bool = True) -> List[int]:
    """Hash many same-width rows (e.g. balance-tree leaf data) — batched
    kernel when large enough, host loop otherwise. Parity: helpers.ts:80."""
    rows = [list(r) for r in rows]
    if not rows:
        return []
    if use_device and len(rows) >= MIN_BATCH_LEAVES:
        from ..hash import mimc_jax
        return [int(v) for v in mimc_jax.multi_hash_ints(rows)]
    return [multi_hash(r) for r in rows]
