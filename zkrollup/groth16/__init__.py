"""Groth16 proving stack: setup / prove / verify over BN254 (SURVEY §2.4).

The TPU-native replacement for the reference's circom->snarkjs->websnark
dependency chain (operator/src/snarks/common.ts:10-53)."""

from .keys import Proof, ProvingKey, VerifyingKey
from .setup import setup
from .prove import prove
from .verify import verify

__all__ = ["Proof", "ProvingKey", "VerifyingKey", "setup", "prove", "verify"]
