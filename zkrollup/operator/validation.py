"""Transaction admission rules — parity with the /send route checks
(/root/reference/operator/src/routes/send.ts:16-150): sender/recipient
existence, balance sufficiency, fee >= 0.3% of amount, nonce continuity,
EdDSA signature over formatTx."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from ..config import RollupConfig
from ..ref import eddsa
from ..tree.merkle import MerkleTree
from ..witness.assembler import Transaction, format_tx


@dataclass
class ValidationError(Exception):
    message: str

    def __str__(self):
        return self.message


def validate_tx(cfg: RollupConfig, tree: MerkleTree, tx: Transaction) -> None:
    """Raises ValidationError on the first failed check (send.ts order)."""
    if tx.from_index >= tree.next_leaf_index:
        raise ValidationError("Sender (from) not found")
    if tx.to_index >= tree.next_leaf_index:
        raise ValidationError("Sender (to) not found")

    sender = tree.get_leaf_raw(tx.from_index)
    if sender is None:
        raise ValidationError("Sender (from) not found")

    if sender["balance"] < tx.amount:
        raise ValidationError(
            f"Sender only has {sender['balance']}, unable to send {tx.amount}")

    # fee >= amount/1000*3, bigInt-truncating division (send.ts:101)
    if cfg.min_fee(tx.amount) > tx.fee:
        raise ValidationError(
            "Fee needs to be at least 0.3% of the amount to be sent")

    if tx.nonce != sender["nonce"] + 1:
        raise ValidationError(
            f"Expected nonce of {sender['nonce'] + 1}, received {tx.nonce}")

    if tx.signature is None or not eddsa.verify(
            format_tx(Transaction(tx.from_index, tx.to_index, tx.amount,
                                  tx.fee, tx.nonce)),
            tx.signature, tuple(sender["publicKey"])):
        raise ValidationError("Invalid signature")
