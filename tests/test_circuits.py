"""Witness-level circuit differential tests at NON-production parameters.

Mirrors the reference's main circuit-test strategy
(/root/reference/prover/__tests__/batchprocesstx.test.ts:245-253,
merkletree.test.ts:58-130): synthesize the circuit with honest inputs built
from real tree operations and assert the output root equals the
sequentially-updated tree; tamper inputs and assert synthesis REJECTS
(Builder check=True raises at the first unsatisfied constraint —
zkrollup/r1cs/builder.py enforce()). Params deliberately differ from
production BatchProcessTx(2, 6) to exercise genericity — batch=4/depth=5,
the reference's own alternate config
(prover/__tests__/circuits/batchprocesstx_test.circom:3).

No proof generation here: witness-only, fast, deterministic.
"""

import copy

import pytest

from zkrollup.config import RollupConfig
from zkrollup.ref import eddsa
from zkrollup.ref import babyjubjub as bjj
from zkrollup.tree.merkle import MerkleTree
from zkrollup.witness.assembler import (Transaction, format_tx,
                                        assemble_batch_inputs,
                                        hash_balance_tree_leaf)
from zkrollup.r1cs.circuits import (synthesize_batch_process_tx,
                                    synthesize_withdraw, synthesize_ecdh)

ETH = 10 ** 18
PRIVS = [(7919 * (i + 1) ** 3 + 13) % (2 ** 250) for i in range(4)]
PUBS = [eddsa.gen_public_key(k) for k in PRIVS]


def _make_tree(depth: int, n_users: int) -> MerkleTree:
    t = MerkleTree(depth)
    for i in range(n_users):
        raw = {"publicKey": PUBS[i], "balance": 2 * ETH, "nonce": 0}
        t.insert_(hash_balance_tree_leaf(raw), raw)
    return t


def _signed_tx(priv, frm, to, amount, fee, nonce) -> Transaction:
    tx = Transaction(frm, to, amount, fee, nonce)
    tx.signature = eddsa.sign(priv, format_tx(tx))
    return tx


@pytest.fixture(scope="module")
def batch45():
    """Honest 4-tx batch on a depth-5 tree, incl. a SELF-SEND (tx 3)."""
    tree = _make_tree(5, 4)
    txs = [
        _signed_tx(PRIVS[0], 0, 1, ETH // 10, ETH // 100, 1),
        _signed_tx(PRIVS[1], 1, 2, ETH // 5, ETH // 100, 1),
        _signed_tx(PRIVS[0], 0, 3, ETH // 4, ETH // 100, 2),
        _signed_tx(PRIVS[2], 2, 2, ETH // 8, ETH // 100, 1),  # self-send
    ]
    inputs, final_tree = assemble_batch_inputs(tree, txs)
    return tree, txs, inputs, final_tree


@pytest.fixture(scope="module")
def batch24():
    """Smaller honest batch for the tamper cases (cheaper synthesis)."""
    tree = _make_tree(4, 3)
    txs = [
        _signed_tx(PRIVS[0], 0, 1, ETH // 10, ETH // 100, 1),
        _signed_tx(PRIVS[1], 1, 2, ETH // 5, ETH // 100, 1),
    ]
    inputs, final_tree = assemble_batch_inputs(tree, txs)
    return tree, txs, inputs, final_tree


class TestBatchProcessTxHonest:
    def test_output_root_matches_tree_45(self, batch45):
        # batchprocesstx.test.ts:245-253 — circuit root vs sequentially
        # updated reference tree, at the reference's alternate (4, 5) params
        tree, txs, inputs, final_tree = batch45
        res = synthesize_batch_process_tx(inputs, 4, 5)
        sig = res.public_signals
        assert sig[0] == final_tree.root
        assert sig[1] == tree.root
        assert final_tree.root != tree.root

    def test_public_signal_count_formula(self, batch45):
        # layout parity: n = 1 + b + 8b + 2b(2+1+1+d) + b + bd
        _, _, inputs, _ = batch45
        res = synthesize_batch_process_tx(inputs, 4, 5)
        cfg = RollupConfig(tree_depth=5, batch_size=4)
        assert len(res.public_signals) == cfg.n_tx_public_signals
        # and the production config yields the contract ABI's uint[73]
        assert RollupConfig().n_tx_public_signals == 73

    def test_self_send_keeps_balance(self, batch45):
        # user 2 received 0.2 from tx 1, then self-sent: net change is
        # only the self-send fee (processtx.circom:152-171 mux semantics)
        _, _, _, final_tree = batch45
        raw = final_tree.leaves_raw[2]
        assert raw["balance"] == 2 * ETH + ETH // 5 - ETH // 100

    def test_structure_is_input_independent(self, batch24):
        # the prover's setup relies on this: dummy-input synthesis yields
        # the same R1CS the honest witness satisfies (prover.py structure())
        _, _, inputs, _ = batch24
        honest = synthesize_batch_process_tx(inputs, 2, 4)
        zeros = {k: copy.deepcopy(v) for k, v in inputs.items()}

        def z(v):
            return [z(x) for x in v] if isinstance(v, list) else 0
        zeros = {k: z(v) for k, v in zeros.items()}
        dummy = synthesize_batch_process_tx(zeros, 2, 4, check=False)
        r_h, r_d = honest.r1cs, dummy.r1cs
        assert (r_h.n_vars, r_h.n_constraints, r_h.n_public) == \
               (r_d.n_vars, r_d.n_constraints, r_d.n_public)

    def test_process_tx_single(self):
        # ProcessTx == BatchProcessTx(1): single-transfer parity at depth 5
        tree = _make_tree(5, 2)
        txs = [_signed_tx(PRIVS[0], 0, 1, ETH // 3, ETH // 100, 1)]
        inputs, final_tree = assemble_batch_inputs(tree, txs)
        res = synthesize_batch_process_tx(inputs, 1, 5)
        assert res.public_signals[0] == final_tree.root


class TestBatchProcessTxRejects:
    """Each tamper must fail synthesis (merkletree.test.ts:119-130 pattern)."""

    def _tampered(self, batch24, mutate):
        _, _, inputs, _ = batch24
        bad = copy.deepcopy(inputs)
        mutate(bad)
        return bad

    def _assert_rejects(self, inputs):
        with pytest.raises(AssertionError):
            synthesize_batch_process_tx(inputs, 2, 4)

    def test_bad_signature(self, batch24):
        def m(i):
            i["txData"][0][7] = (i["txData"][0][7] + 1) % bjj.SUB_ORDER
        self._assert_rejects(self._tampered(batch24, m))

    def test_wrong_nonce(self, batch24):
        # properly signed tx with a skipped nonce: signature is VALID, the
        # nonce-continuity constraint is what rejects
        tree = _make_tree(4, 3)
        txs = [_signed_tx(PRIVS[0], 0, 1, ETH // 10, ETH // 100, 3)]
        inputs, _ = assemble_batch_inputs(tree, txs)
        with pytest.raises(AssertionError):
            synthesize_batch_process_tx(inputs, 1, 4)

    def test_insufficient_balance(self, batch24):
        tree = _make_tree(4, 3)
        txs = [_signed_tx(PRIVS[0], 0, 1, 3 * ETH, ETH // 100, 1)]
        inputs, _ = assemble_batch_inputs(tree, txs)
        with pytest.raises(AssertionError):
            synthesize_batch_process_tx(inputs, 1, 4)

    def test_zero_amount(self, batch24):
        tree = _make_tree(4, 3)
        txs = [_signed_tx(PRIVS[0], 0, 1, 0, ETH // 100, 1)]
        inputs, _ = assemble_batch_inputs(tree, txs)
        with pytest.raises(AssertionError):
            synthesize_batch_process_tx(inputs, 1, 4)

    def test_zero_fee(self, batch24):
        tree = _make_tree(4, 3)
        txs = [_signed_tx(PRIVS[0], 0, 1, ETH // 10, 0, 1)]
        inputs, _ = assemble_batch_inputs(tree, txs)
        with pytest.raises(AssertionError):
            synthesize_batch_process_tx(inputs, 1, 4)

    def test_wrong_path_element(self, batch24):
        def m(i):
            i["txSenderPathElements"][0][2] += 1
        self._assert_rejects(self._tampered(batch24, m))

    def test_wrong_intermediate_root(self, batch24):
        def m(i):
            i["intermediateBalanceTreeRoot"][0] += 1
        self._assert_rejects(self._tampered(batch24, m))

    def test_root_discontinuity(self, batch24):
        def m(i):
            i["balanceTreeRoot"][1] += 1
        self._assert_rejects(self._tampered(batch24, m))

    def test_wrong_sender_balance(self, batch24):
        def m(i):
            i["txSenderBalance"][0] += 1
        self._assert_rejects(self._tampered(batch24, m))


class TestWithdrawCircuit:
    def test_outputs_are_derived_pubkey(self):
        # withdraw.circom:4-25 — outputs = priv*Base8, nullifier passthrough
        fpriv = eddsa.format_priv_key_for_babyjub(PRIVS[0])
        nullifier = 123456789
        res = synthesize_withdraw(fpriv, nullifier)
        sig = res.public_signals
        assert len(sig) == 3
        assert (sig[0], sig[1]) == PUBS[0]
        assert sig[2] == nullifier


class TestEcdhCircuit:
    def test_shared_key_matches_reference(self):
        # ecdh.circom:6-27 vs crypto.ts ecdh
        fpriv = eddsa.format_priv_key_for_babyjub(PRIVS[0])
        res = synthesize_ecdh(fpriv, PUBS[1])
        assert res.public_signals[0] == eddsa.ecdh(PRIVS[0], PUBS[1])
