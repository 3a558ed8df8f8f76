"""Operator + chain-simulator tests (no proving; fast host-only paths).

Mirrors the reference's operator unit tests and the service-route behavior
of send.ts / users.ts / pubsub.ts; proof-dependent paths are covered in
test_e2e_rollup.py.
"""

import json
import threading
import urllib.request

import pytest

from zkrollup.config import RollupConfig
from zkrollup.ref import eddsa
from zkrollup.ref.mimc import multi_hash
from zkrollup.chain.simulator import RollUpContract, ChainMerkleTree
from zkrollup.chain.calldata import (to_solidity_proof, rollup_calldata,
                                     deposit_calldata, function_selector)
from zkrollup.groth16.keys import Proof
from zkrollup.operator.state import OperatorState
from zkrollup.operator.queue import TxQueue
from zkrollup.operator.validation import validate_tx, ValidationError
from zkrollup.operator.service import OperatorApp, start_app
from zkrollup.witness.assembler import Transaction, format_tx
from zkrollup.tree.merkle import create_merkle_tree

CFG = RollupConfig(tree_depth=6, batch_size=2)
PRIV_A = 1234567890123456789
PRIV_B = 9876543210987654321
PUB_A = eddsa.gen_public_key(PRIV_A)
PUB_B = eddsa.gen_public_key(PRIV_B)
WEI = 10 ** 18


def make_contract():
    return RollUpContract(CFG, tx_vk=None, withdraw_vk=None)


def signed_tx(priv, frm, to, amount, fee, nonce):
    tx = Transaction(frm, to, amount, fee, nonce)
    tx.signature = eddsa.sign(priv, format_tx(tx))
    return tx


class TestChainSimulator:
    def test_deposit_insert_then_update(self):
        c = make_contract()
        c.deposit(PUB_A[0], PUB_A[1], WEI)
        assert c.is_public_key_registered(*PUB_A)
        data = c.get_user_data(multi_hash(list(PUB_A)))
        assert data[3] == WEI and data[0] == 0
        root1 = c.balance_tree.get_root()
        c.deposit(PUB_A[0], PUB_A[1], WEI)  # second deposit -> update
        assert c.get_user_data(multi_hash(list(PUB_A)))[3] == 2 * WEI
        assert c.balance_tree.get_root() != root1
        assert c.balance_tree.get_inserted_leaves_no() == 1

    def test_chain_tree_matches_operator_tree(self):
        # Solidity tree and TS tree share the algorithm: differential root
        # equality after inserts/updates (contracts merkletree.test.ts)
        c = ChainMerkleTree(5, 0)
        c.whitelist.add("x")
        m = create_merkle_tree(5, 0)
        for i in range(5):
            leaf = multi_hash([i + 7])
            c.insert(leaf, "x")
            m.insert_(leaf)
            assert c.get_root() == m.root
        c.update(2, multi_hash([99]), "x")
        m.update_(2, multi_hash([99]))
        assert c.get_root() == m.root

    def test_tree_whitelist(self):
        c = ChainMerkleTree(5, 0)
        with pytest.raises(PermissionError):
            c.insert(1, "mallory")

    def test_rollup_rejects_wrong_root(self):
        c = make_contract()
        c.deposit(PUB_A[0], PUB_A[1], WEI)
        dummy = Proof(a=(1, 2), b=((0, 0), (0, 0)), c=(1, 2))
        inputs = [0] * CFG.n_tx_public_signals
        with pytest.raises(ValueError, match="not valid for current tree"):
            c.roll_up(dummy, inputs)

    def test_rollup_rejects_bad_proof(self):
        c = make_contract()
        c.deposit(PUB_A[0], PUB_A[1], WEI)
        dummy = Proof(a=(1, 2), b=((0, 0), (0, 0)), c=(1, 2))
        inputs = [0] * CFG.n_tx_public_signals
        inputs[1] = c.balance_tree.get_root()
        with pytest.raises(ValueError, match="Invalid roll up proofs"):
            c.roll_up(dummy, inputs)

    def test_withdraw_nullifier_and_balance_guards(self):
        c = make_contract()
        dummy = Proof(a=(1, 2), b=((0, 0), (0, 0)), c=(1, 2))
        with pytest.raises(ValueError, match="Unauthorized"):
            c.withdraw(1, dummy, [PUB_A[0], PUB_A[1], 42])
        c.used_nullifiers[42] = True
        with pytest.raises(ValueError, match="Nullifier has been used"):
            c.withdraw(1, dummy, [PUB_A[0], PUB_A[1], 42])


class TestCalldata:
    def test_pi_b_inner_reversal(self):
        proof = Proof(a=(11, 22), b=((1, 2), (3, 4)), c=(55, 66))
        sp = to_solidity_proof(proof, [7, 8])
        assert sp["b"] == [[2, 1], [4, 3]]  # common.ts:45-47
        assert sp["a"] == [11, 22] and sp["inputs"] == [7, 8]

    def test_rollup_calldata_shape(self):
        proof = Proof(a=(11, 22), b=((1, 2), (3, 4)), c=(55, 66))
        data = rollup_calldata(proof, list(range(73)))
        assert len(data) == 4 + 32 * (2 + 4 + 2 + 73)
        assert data[:4] == function_selector(
            "rollUp(uint256[2],uint256[2][2],uint256[2],uint256[73])")
        # word 0 = a.x, words 2..5 = b with inner reversal
        assert int.from_bytes(data[4:36], "big") == 11
        assert int.from_bytes(data[4 + 32 * 2:4 + 32 * 3], "big") == 2

    def test_deposit_calldata(self):
        d = deposit_calldata(5, 6)
        assert len(d) == 4 + 64


def setup_state_with_deposits():
    c = make_contract()
    state = OperatorState(CFG)
    c.deposit(PUB_A[0], PUB_A[1], WEI)
    c.deposit(PUB_B[0], PUB_B[1], WEI)
    for ev in c.events:
        state.on_chain_event(ev)
    return c, state


class TestOperatorState:
    def test_event_sync_matches_chain(self):
        c, state = setup_state_with_deposits()
        assert state.load_tree().root == c.balance_tree.get_root()

    def test_out_of_sync_event_raises(self):
        _, state = setup_state_with_deposits()
        from zkrollup.chain.simulator import Event
        bad = Event("Deposit", {"balanceTreeIndex": 7, "publicKeyX": 1,
                                "publicKeyY": 2, "balance": 3, "nonce": 0})
        with pytest.raises(RuntimeError, match="out of sync"):
            state.on_chain_event(bad)

    def test_withdraw_event_updates_leaf(self):
        c, state = setup_state_with_deposits()
        from zkrollup.chain.simulator import Event
        ev = Event("Withdraw", {"balanceTreeIndex": 0, "publicKeyX": PUB_A[0],
                                "publicKeyY": PUB_A[1], "balance": WEI // 2,
                                "nonce": 0})
        state.on_chain_event(ev)
        assert state.load_tree().get_leaf_raw(0)["balance"] == WEI // 2


class TestValidation:
    def _tree(self):
        _, state = setup_state_with_deposits()
        return state.load_tree()

    def test_valid_tx_passes(self):
        tree = self._tree()
        validate_tx(CFG, tree, signed_tx(PRIV_A, 0, 1, WEI // 10, WEI // 100, 1))

    def test_unknown_sender(self):
        with pytest.raises(ValidationError, match="not found"):
            validate_tx(CFG, self._tree(),
                        signed_tx(PRIV_A, 5, 1, WEI // 10, WEI // 100, 1))

    def test_insufficient_balance(self):
        with pytest.raises(ValidationError, match="unable to send"):
            validate_tx(CFG, self._tree(),
                        signed_tx(PRIV_A, 0, 1, 2 * WEI, WEI // 100, 1))

    def test_fee_floor(self):
        # 0.3% of 0.1 ETH = 0.0003 ETH; offer less
        with pytest.raises(ValidationError, match="0.3%"):
            validate_tx(CFG, self._tree(),
                        signed_tx(PRIV_A, 0, 1, WEI // 10, 10 ** 14 // 10, 1))

    def test_wrong_nonce(self):
        with pytest.raises(ValidationError, match="nonce"):
            validate_tx(CFG, self._tree(),
                        signed_tx(PRIV_A, 0, 1, WEI // 10, WEI // 100, 5))

    def test_bad_signature(self):
        tx = signed_tx(PRIV_B, 0, 1, WEI // 10, WEI // 100, 1)  # wrong key
        with pytest.raises(ValidationError, match="Invalid signature"):
            validate_tx(CFG, self._tree(), tx)

    def test_pending_projection_allows_chained_nonces(self):
        """A sender's second tx (nonce 2) must be admitted while tx nonce 1
        is still queued — the batch circuit chains them in one proof."""
        tree = self._tree()
        tx1 = signed_tx(PRIV_A, 0, 1, WEI // 10, WEI // 100, 1)
        tx2 = signed_tx(PRIV_A, 0, 1, WEI // 10, WEI // 100, 2)
        with pytest.raises(ValidationError, match="nonce"):
            validate_tx(CFG, tree, tx2)              # without projection
        validate_tx(CFG, tree, tx2, pending=[tx1])   # with projection

    def test_pending_projection_tracks_balance(self):
        """A queued debit must count against the sender's spendable funds."""
        tree = self._tree()  # A holds 1 ETH
        tx1 = signed_tx(PRIV_A, 0, 1, WEI * 7 // 10, WEI // 100, 1)
        tx2 = signed_tx(PRIV_A, 0, 1, WEI * 5 // 10, WEI // 100, 2)
        with pytest.raises(ValidationError, match="unable to send"):
            validate_tx(CFG, tree, tx2, pending=[tx1])

    def test_pending_projection_credits_recipient(self):
        """A queued credit enables the recipient to spend it onward."""
        tree = self._tree()  # B holds 1 ETH
        tx1 = signed_tx(PRIV_A, 0, 1, WEI * 9 // 10, WEI // 100, 1)
        # B forwards 1.5 ETH, possible only with A's queued credit
        tx2 = signed_tx(PRIV_B, 1, 0, WEI * 15 // 10, WEI // 100, 1)
        with pytest.raises(ValidationError, match="unable to send"):
            validate_tx(CFG, tree, tx2)
        validate_tx(CFG, tree, tx2, pending=[tx1])


class TestQueue:
    def test_cursors_and_fifo(self):
        q = TxQueue()
        assert q.peek_batch(1) is None
        for i in range(3):
            q.push(signed_tx(PRIV_A, 0, 1, WEI // 10, WEI // 100, i + 1))
        assert q.pending_count() == 3
        batch = q.peek_batch(2)
        assert [t.nonce for t in batch] == [1, 2]
        q.mark_processed(2)
        assert q.pending_count() == 1
        assert q.peek_batch(2) is None
        assert [t.nonce for t in q.peek_batch(1)] == [3]

    def test_roundtrip_signature(self):
        q = TxQueue()
        tx = signed_tx(PRIV_A, 0, 1, WEI // 10, WEI // 100, 1)
        q.push(tx)
        got = q.peek_batch(1)[0]
        assert got.signature.S == tx.signature.S
        assert got.signature.R8 == tx.signature.R8
        assert got.amount == tx.amount


class TestHTTPService:
    def test_routes_over_http(self):
        c, state = setup_state_with_deposits()
        queue = TxQueue()
        app = OperatorApp(CFG, state, queue, c)
        server = start_app(app, port=0)
        port = server.server_address[1]
        base = f"http://127.0.0.1:{port}"
        try:
            with urllib.request.urlopen(f"{base}/contracts") as r:
                assert json.load(r)["batchSize"] == 2

            with urllib.request.urlopen(f"{base}/users/index/0") as r:
                u = json.load(r)
            assert u["publicKey"] == [str(PUB_A[0]), str(PUB_A[1])]

            addr = hex(multi_hash(list(PUB_A)))[2:]
            with urllib.request.urlopen(f"{base}/users/address/{addr}") as r:
                assert json.load(r)["balance"] == str(WEI)

            tx = signed_tx(PRIV_A, 0, 1, WEI // 10, WEI // 100, 1)
            body = json.dumps({
                "from": 0, "to": 1, "amount": str(tx.amount),
                "fee": str(tx.fee), "nonce": tx.nonce,
                "signature": {"R8": [str(tx.signature.R8[0]),
                                     str(tx.signature.R8[1])],
                              "S": str(tx.signature.S)}}).encode()
            req = urllib.request.Request(f"{base}/send", data=body,
                                         method="POST")
            with urllib.request.urlopen(req) as r:
                assert json.load(r)["status"] == "Transaction accepted"
            assert queue.pending_count() == 1

            # missing params -> error payload
            req = urllib.request.Request(f"{base}/send", data=b"{}",
                                         method="POST")
            try:
                urllib.request.urlopen(req)
                assert False, "expected 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400
                assert "Missing parameters" in e.read().decode()

            with urllib.request.urlopen(f"{base}/metrics") as r:
                assert json.load(r)["queue_pending"] == 1
        finally:
            server.shutdown()


class TestCLIService:
    """Service-mode CLI commands over a real socket (scripts/index.js:71-188
    parity: deposit/send/user against a running operator)."""

    def test_deposit_send_user_flow(self):
        from zkrollup.cli import main as cli
        c = make_contract()
        state = OperatorState(CFG)
        queue = TxQueue()
        app = OperatorApp(CFG, state, queue, c)
        server = start_app(app, port=0)
        base = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            assert cli.main(["--url", base, "deposit", "--user", "A",
                             "--eth", "1"]) == 0
            assert cli.main(["--url", base, "deposit", "--user", "B",
                             "--eth", "1"]) == 0
            # operator mirrored the deposits via the chain gateway sync
            assert state.load_tree().next_leaf_index == 2

            # auto fee (0.3% floor) and auto nonce (on-chain + 1)
            assert cli.main(["--url", base, "send", "--from", "A",
                             "--to", "B", "--eth", "0.1"]) == 0
            assert queue.pending_count() == 1

            assert cli.main(["--url", base, "user", "--user", "A"]) == 0
            assert cli.main(["--url", base, "user", "--index", "1"]) == 0
            assert cli.main(["--url", base, "user", "--index", "9"]) == 1

            # no daemon configured -> prove-batch reports the error
            assert cli.main(["--url", base, "prove-batch"]) == 1
        finally:
            server.shutdown()

    def test_chain_withdraw_route_validates(self):
        import urllib.request
        c = make_contract()
        state = OperatorState(CFG)
        app = OperatorApp(CFG, state, TxQueue(), c)
        server = start_app(app, port=0)
        base = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            req = urllib.request.Request(
                f"{base}/chain/withdraw", data=b'{"amount": "1"}',
                method="POST")
            try:
                urllib.request.urlopen(req)
                assert False, "expected 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400
        finally:
            server.shutdown()


class TestDeploy:
    """migrations/3_deploy_contracts.js parity: wiring + build artifacts."""

    def test_deploy_writes_artifacts(self, tmp_path):
        from zkrollup.chain.deploy import deploy, load_deployed_addresses
        from zkrollup.groth16.setup import setup
        from zkrollup.r1cs.builder import Builder
        bld = Builder()
        out = bld.alloc_output_deferred()
        x = bld.alloc_public_input(3)
        bld.bind_output(out, bld.mul(x, x))
        vk = setup(bld.r1cs(), seed=b"deploy-test").vk

        contract, addrs = deploy(CFG, tx_vk=vk, withdraw_vk=vk,
                                 build_dir=str(tmp_path))
        # same artifact keys the reference's env.ts reads
        assert set(addrs) == {"balanceTreeAddress", "rollUpAddress",
                              "withdrawVerifierAddress",
                              "txVerifierAddress"}
        assert load_deployed_addresses(str(tmp_path)) == addrs
        src = (tmp_path / "TxVerifier.sol").read_text()
        assert "contract TxVerifier" in src
        assert (tmp_path / "WithdrawVerifier.sol").exists()
        # the deployed contract is live (whitelisted tree, deposits work)
        contract.deposit(PUB_A[0], PUB_A[1], WEI)
        assert contract.get_user_key(0) != 0
