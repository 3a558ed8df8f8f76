"""Merkle tree parity + persistence round-trip tests.

Mirrors operator/__tests__/utils/__tests__/merkletree.test.ts: insert/update
semantics, immutability of the copy-on-write API, path reconstruction, and
store round-trip equality (pg there, sqlite here).
"""

import pytest

from zkrollup.ref.mimc import multi_hash
from zkrollup.tree.merkle import create_merkle_tree
from zkrollup.tree.store import TreeStore


def leaf(i):
    return multi_hash([i, i + 1, i + 2])


class TestMerkleTree:
    def test_empty_root_is_double_hashed_top_zero(self):
        m = create_merkle_tree(4, 0)
        # root = H(zeros[d-1], zeros[d-1]) (merkletree.ts:77-80)
        assert m.root == multi_hash([m.zeros[3], m.zeros[3]])

    def test_capacity_quirk(self):
        # depth-6 tree accepts only 2^(6-1)=32 leaf slots, minus the
        # off-by-one in the check (insert requires next+1 < max)
        m = create_merkle_tree(6, 0)
        assert m.max_leaf_index == 32

    def test_insert_then_path_reconstructs_root(self):
        m = create_merkle_tree(5, 0)
        for i in range(6):
            m.insert_(leaf(i))
        for idx in range(6):
            p = m.get_update_path(idx)
            h = m.leaves[idx]
            cur = idx
            for lvl in range(m.depth):
                if p.path_indexes[lvl] == 0:
                    h = multi_hash([h, p.path_elements[lvl]])
                else:
                    h = multi_hash([p.path_elements[lvl], h])
                cur //= 2
            assert h == m.root

    def test_update_changes_root_and_reverts(self):
        m = create_merkle_tree(5, 0)
        for i in range(4):
            m.insert_(leaf(i))
        old_root = m.root
        m2 = m.update(2, leaf(99))
        assert m2.root != old_root
        assert m.root == old_root  # immutability
        m3 = m2.update(2, leaf(2))
        assert m3.root == old_root

    def test_update_unknown_leaf_raises(self):
        m = create_merkle_tree(5, 0)
        m.insert_(leaf(0))
        with pytest.raises(ValueError):
            m.update(3, leaf(1))

    def test_insert_immutable_copy(self):
        m = create_merkle_tree(5, 0)
        m2 = m.insert(leaf(0), {"x": 1})
        assert m.next_leaf_index == 0
        assert m2.next_leaf_index == 1
        assert m2.get_leaf_raw(0) == {"x": 1}

    def test_equals(self):
        m1 = create_merkle_tree(5, 0)
        m2 = create_merkle_tree(5, 0)
        assert m1.equals(m2)
        m1.insert_(leaf(0))
        assert not m1.equals(m2)
        m2.insert_(leaf(0))
        assert m1.equals(m2)

    def test_zero_value_changes_empty_root(self):
        assert create_merkle_tree(5, 0).root != create_merkle_tree(5, 1).root


class TestTreeStore:
    def test_roundtrip_equality(self):
        # parity with merkletree.test.ts pg round-trip: save after each
        # insert, then load and compare full state
        store = TreeStore(":memory:")
        m = create_merkle_tree(5, 0)
        for i in range(5):
            m.insert_(leaf(i), {"i": i})
            store.save("balanceTree", m)
        loaded = store.load("balanceTree")
        assert m.equals(loaded)
        assert loaded.root == m.root
        assert loaded.get_leaf_raw(3) == {"i": 3}

    def test_update_persisted(self):
        store = TreeStore(":memory:")
        m = create_merkle_tree(5, 0)
        for i in range(3):
            m.insert_(leaf(i), i)
            store.save("t", m)
        m.update_(1, leaf(42), 42)
        store.save("t", m, leaf_index=1)
        loaded = store.load("t")
        assert m.equals(loaded)

    def test_missing_tree_raises(self):
        store = TreeStore(":memory:")
        with pytest.raises(KeyError):
            store.load("nope")

    def test_loaded_tree_usable(self):
        store = TreeStore(":memory:")
        m = create_merkle_tree(5, 0)
        for i in range(3):
            m.insert_(leaf(i), i)
            store.save("t", m)
        loaded = store.load("t")
        loaded.insert_(leaf(3), 3)
        m.insert_(leaf(3), 3)
        assert loaded.root == m.root


class TestBulkBuild:
    """tree/bulk.py: batched-kernel rebuild == sequential insert_ state."""

    def _incremental(self, n, depth=6):
        t = create_merkle_tree(depth)
        for i in range(n):
            t.insert_(1000 + i, {"i": i})
        return t

    @pytest.mark.parametrize("n", [1, 2, 3, 5, 16, 31])
    def test_equals_incremental(self, n):
        from zkrollup.tree import bulk
        inc = self._incremental(n)
        got = bulk.from_leaves([1000 + i for i in range(n)], 6,
                               leaves_raw=[{"i": i} for i in range(n)])
        assert got.equals(inc)

    def test_empty(self):
        from zkrollup.tree import bulk
        assert bulk.from_leaves([], 6).equals(create_merkle_tree(6))

    def test_capacity_enforced(self):
        from zkrollup.tree import bulk
        with pytest.raises(ValueError):
            bulk.from_leaves(list(range(32)), 6)  # max is 2^(6-1)-1 usable

    def test_host_and_device_paths_agree(self):
        from zkrollup.tree import bulk
        leaves = [7 * i + 3 for i in range(24)]
        dev = bulk.from_leaves(leaves, 6, use_device=True)
        host = bulk.from_leaves(leaves, 6, use_device=False)
        assert dev.equals(host)

    def test_multi_hash_rows_bit_exact(self):
        # the batched kernel vs the scalar reference sponge (leaf hashing,
        # helpers.ts:80-82 parity)
        from zkrollup.tree import bulk
        from zkrollup.ref.mimc import multi_hash
        rows = [[i, i * 31 + 5, i ** 3, 1] for i in range(20)]
        got = bulk.multi_hash_rows(rows, use_device=True)
        assert got == [multi_hash(r) for r in rows]

    def test_store_integrity_check(self, tmp_path):
        from zkrollup.tree.store import TreeStore
        store = TreeStore(str(tmp_path / "t.db"))
        t = self._incremental(9)
        store.save_all_leaves("balanceTree", t)
        assert store.verify_integrity("balanceTree")
        # corrupt one leaf hash behind the store's back
        store.conn.execute("UPDATE leaves SET hash='12345' WHERE idx=3")
        store.conn.commit()
        assert not store.verify_integrity("balanceTree")
