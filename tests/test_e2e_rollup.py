"""The flagship end-to-end rollup loop, automated.

Mirrors /root/reference/operator/__tests__/operatorLogic.test.ts:34-253 —
the only test of the complete loop in the reference: deposits -> two signed
transfers -> a REAL BatchProcessTx Groth16 proof -> on-chain `rollUp()`
txData replay -> exact balance/nonce/fee assertions (A: 0.57 ETH nonce 2,
B: 1.4 ETH, fees 0.03 — operatorLogic.test.ts:242-249).

The fast tier runs the production (batch=2, depth=6) circuit through the
native host prover (groth16/prove.py backend="host" — the websnark-analog
engine, seconds per proof on CPU); the `slow` tier re-proves the same batch
through the full JAX device pipeline and asserts the proofs are
BIT-IDENTICAL with pinned (r, s).
"""

import os

import pytest

from zkrollup.config import RollupConfig
from zkrollup.ref import eddsa
from zkrollup.ref.mimc import multi_hash
from zkrollup.chain.simulator import RollUpContract
from zkrollup.operator.state import OperatorState
from zkrollup.operator.queue import TxQueue
from zkrollup.operator.prover import TxProver
from zkrollup.operator.batchd import BatchDaemon
from zkrollup.operator.service import OperatorApp
from zkrollup.witness.assembler import Transaction, format_tx
from zkrollup.native import engine

WEI = 10 ** 18
PRIV_A = 1234567890123456789
PRIV_B = 9876543210987654321
PUB_A = eddsa.gen_public_key(PRIV_A)
PUB_B = eddsa.gen_public_key(PRIV_B)

pytestmark = pytest.mark.skipif(
    not engine.available(),
    reason="libzkhost not built (make -C native) — host prover required")

CFG = RollupConfig()  # production (2, 6)
_KEYS = os.path.join(os.path.dirname(__file__), ".keys_cache",
                     f"tx_{CFG.batch_size}_{CFG.tree_depth}.npz")


@pytest.fixture(scope="module")
def prover():
    os.makedirs(os.path.dirname(_KEYS), exist_ok=True)
    p = TxProver(CFG, key_path=_KEYS, setup_seed=b"e2e")
    p.ensure_keys()
    return p


@pytest.fixture()
def rollup_env(prover):
    contract = RollUpContract(CFG, tx_vk=prover.ensure_keys().vk,
                              withdraw_vk=None)
    state = OperatorState(CFG)
    queue = TxQueue()
    daemon = BatchDaemon(CFG, state, queue, prover, contract)
    app = OperatorApp(CFG, state, queue, contract, daemon)
    return contract, state, queue, daemon, app


def _send(app, priv, frm, to, amount, fee, nonce):
    tx = Transaction(frm, to, amount, fee, nonce)
    tx.signature = eddsa.sign(priv, format_tx(tx))
    return app.post_send({
        "from": frm, "to": to, "amount": str(amount), "fee": str(fee),
        "nonce": nonce,
        "signature": {"R8": [str(tx.signature.R8[0]),
                             str(tx.signature.R8[1])],
                      "S": str(tx.signature.S)}})


def _wei(eth_hundredths: int) -> int:
    return eth_hundredths * WEI // 100


class TestEndToEndRollup:
    def test_reference_scenario(self, rollup_env):
        """operatorLogic.test.ts:34-253, the north-star path."""
        contract, state, queue, daemon, app = rollup_env

        # deposits: A 1.0 ETH, B 1.0 ETH (test.ts:84-103)
        contract.deposit(PUB_A[0], PUB_A[1], WEI)
        contract.deposit(PUB_B[0], PUB_B[1], WEI)
        app.sync_chain()
        assert state.load_tree().next_leaf_index == 2

        # two signed sends A->B: 0.1 (fee 0.01) then 0.3 (fee 0.02)
        assert _send(app, PRIV_A, 0, 1, _wei(10), _wei(1), 1) == \
            {"status": "Transaction accepted"}
        assert _send(app, PRIV_A, 0, 1, _wei(30), _wei(2), 2) == \
            {"status": "Transaction accepted"}

        # prove + rollUp() via the batch daemon
        assert daemon.step() is True
        assert queue.pending_count() == 0

        # the reference's exact post-state (test.ts:242-249)
        a = contract.get_user_data(multi_hash(list(PUB_A)))
        b = contract.get_user_data(multi_hash(list(PUB_B)))
        assert a[3] == _wei(57) and a[4] == 2   # 0.57 ETH, nonce 2
        assert b[3] == _wei(140) and b[4] == 0  # 1.4 ETH
        assert contract.get_accrued_fees() == _wei(3)

        # operator mirror converged to the on-chain root
        assert state.load_tree().root == contract.balance_tree.get_root()

        # stats got recorded (ProveStats — the observability obligation)
        assert prover_stats_ok(daemon)

    def test_tampered_proof_rejected(self, rollup_env, prover):
        contract, state, queue, daemon, app = rollup_env
        contract.deposit(PUB_A[0], PUB_A[1], WEI)
        contract.deposit(PUB_B[0], PUB_B[1], WEI)
        app.sync_chain()
        _send(app, PRIV_A, 0, 1, _wei(10), _wei(1), 1)
        _send(app, PRIV_A, 0, 1, _wei(30), _wei(2), 2)

        txs = queue.peek_batch(CFG.batch_size)
        proof, signals, _final = prover.prove_batch(state.load_tree(), txs)
        from zkrollup.groth16.keys import Proof
        bad = Proof(a=(proof.a[0], (proof.a[1] + 1)), b=proof.b, c=proof.c)
        with pytest.raises(ValueError):
            contract.roll_up(bad, signals)
        # wrong pre-state root also rejected (RollUp.sol:92)
        bad_signals = list(signals)
        bad_signals[1] += 1
        with pytest.raises(ValueError):
            contract.roll_up(proof, bad_signals)

    def test_proof_determinism(self, rollup_env, prover):
        """Same inputs + pinned (r, s) => identical proof bytes — the
        determinism/race gate (SURVEY §5)."""
        contract, state, queue, daemon, app = rollup_env
        contract.deposit(PUB_A[0], PUB_A[1], WEI)
        contract.deposit(PUB_B[0], PUB_B[1], WEI)
        app.sync_chain()
        _send(app, PRIV_A, 0, 1, _wei(10), _wei(1), 1)
        txs = [queue.pending_txs()[0]] * 1
        # batch needs batch_size txs; reuse prove_batch only when full —
        # prove directly at witness level instead
        _send(app, PRIV_A, 0, 1, _wei(30), _wei(2), 2)
        txs = queue.peek_batch(CFG.batch_size)
        tree = state.load_tree()
        p1, s1, _ = prover.prove_batch(tree, txs, r=11, s=13)
        p2, s2, _ = prover.prove_batch(tree, txs, r=11, s=13)
        assert (p1.a, p1.b, p1.c) == (p2.a, p2.b, p2.c)
        assert s1 == s2

    @pytest.mark.slow
    def test_host_and_device_proofs_bit_identical(self, rollup_env, prover):
        """The JAX device pipeline and the native host engine produce the
        SAME proof with pinned (r, s) on the production circuit."""
        contract, state, queue, daemon, app = rollup_env
        contract.deposit(PUB_A[0], PUB_A[1], WEI)
        contract.deposit(PUB_B[0], PUB_B[1], WEI)
        app.sync_chain()
        _send(app, PRIV_A, 0, 1, _wei(10), _wei(1), 1)
        _send(app, PRIV_A, 0, 1, _wei(30), _wei(2), 2)
        txs = queue.peek_batch(CFG.batch_size)
        tree = state.load_tree()

        from zkrollup.witness.assembler import assemble_batch_inputs
        from zkrollup.r1cs.circuits import synthesize_batch_process_tx
        from zkrollup.groth16.prove import prove
        from zkrollup.groth16.verify import verify
        inputs, _ = assemble_batch_inputs(tree, txs)
        res = synthesize_batch_process_tx(
            inputs, CFG.batch_size, CFG.tree_depth)
        pk = prover.ensure_keys()
        p_host = prove(pk, res.r1cs, res.witness, r=3, s=9, backend="host")
        p_dev = prove(pk, res.r1cs, res.witness, r=3, s=9, backend="device")
        assert (p_host.a, p_host.b, p_host.c) == (p_dev.a, p_dev.b, p_dev.c)
        assert verify(pk.vk, p_host, res.public_signals)


class TestPipelinedDaemon:
    """DP pipeline (VERDICT r4 #7): witness(i+1) overlapped with prove(i)
    must settle multiple batches with the same post-state as sequential
    stepping, strictly in order."""

    def test_two_batches_pipelined(self, rollup_env):
        contract, state, queue, daemon, app = rollup_env
        contract.deposit(PUB_A[0], PUB_A[1], 2 * WEI)
        contract.deposit(PUB_B[0], PUB_B[1], WEI)
        app.sync_chain()
        # four sends -> two batches; nonces chain across batches
        _send(app, PRIV_A, 0, 1, _wei(10), _wei(1), 1)
        _send(app, PRIV_A, 0, 1, _wei(10), _wei(1), 2)
        _send(app, PRIV_A, 0, 1, _wei(10), _wei(1), 3)
        _send(app, PRIV_A, 0, 1, _wei(10), _wei(1), 4)
        assert queue.pending_count() == 4

        done = daemon.run_pipeline(max_batches=2)
        assert done == 2
        assert queue.pending_count() == 0
        assert daemon.metrics.batches_proven == 2
        assert daemon.metrics.txs_processed == 4

        a = contract.get_user_data(multi_hash(list(PUB_A)))
        b = contract.get_user_data(multi_hash(list(PUB_B)))
        # A: 2.0 - 4*(0.10+0.01) = 1.56, nonce 4; B: 1.0 + 0.40 = 1.40
        assert a[3] == _wei(156) and a[4] == 4
        assert b[3] == _wei(140)
        assert contract.get_accrued_fees() == _wei(4)
        assert state.load_tree().root == contract.balance_tree.get_root()

    def test_pipeline_respects_step_lock(self, rollup_env):
        contract, state, queue, daemon, app = rollup_env
        assert daemon._step_lock.acquire(blocking=False)
        try:
            assert daemon.run_pipeline(max_batches=1) == 0
        finally:
            daemon._step_lock.release()


def prover_stats_ok(daemon: BatchDaemon) -> bool:
    m = daemon.metrics
    return (m.batches_proven == 1 and m.txs_processed == 2
            and m.last_prove_seconds > 0)
