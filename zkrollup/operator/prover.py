"""Proof generation services for the operator: key management + prove calls.

Replaces the reference's snark glue layer (createProofGenerator at
/root/reference/operator/src/snarks/common.ts:10-53, instanced as
genTxVerifierProof / genWithdrawVerifierProof in snarks/{tx,withdraw}.ts).
Differences by design:
  - keys are set up once and cached (npz), not compiled-at-proof-time
  - proof generation runs the TPU pipeline (groth16/prove.py)
  - the mandatory self-verify before returning is kept (common.ts:30-38:
    "Invalid proof generated")
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

from ..config import RollupConfig
from ..r1cs.circuits import (synthesize_batch_process_tx, synthesize_withdraw)
from ..groth16.keys import ProvingKey, Proof, r1cs_digest
from ..groth16.setup import setup
from ..groth16.prove import prove
from ..groth16.verify import verify
from ..witness.assembler import Transaction, assemble_batch_inputs
from ..tree.merkle import MerkleTree


def _dummy_tx_inputs(batch_size: int, depth: int) -> Dict:
    """All-zero inputs for structure-only synthesis (check=False). The
    constraint structure is input-independent (static circuits), so this
    yields the exact R1CS the setup must bind."""
    z, d = 0, depth
    return {
        "balanceTreeRoot": [z] * batch_size,
        "txData": [[z] * 8 for _ in range(batch_size)],
        "txSenderPublicKey": [[z, z] for _ in range(batch_size)],
        "txSenderBalance": [z] * batch_size,
        "txSenderNonce": [z] * batch_size,
        "txSenderPathElements": [[z] * d for _ in range(batch_size)],
        "txRecipientPublicKey": [[z, z] for _ in range(batch_size)],
        "txRecipientBalance": [z] * batch_size,
        "txRecipientNonce": [z] * batch_size,
        "txRecipientPathElements": [[z] * d for _ in range(batch_size)],
        "intermediateBalanceTreeRoot": [z] * batch_size,
        "intermediateBalanceTreePathElements": [[z] * d
                                                for _ in range(batch_size)],
    }


def _warn_stale_key(path: str) -> None:
    """A discarded cache is not silent: regeneration uses a fresh (random
    unless --deterministic) toxic waste, so any verifier deployed from the
    old key — or another process that already loaded the old file — now
    rejects every proof from the new one."""
    import sys
    print(f"WARNING: cached proving key {path} has a stale R1CS digest; "
          "regenerating. Verifiers deployed from the old key are now "
          "invalid — redeploy them from the new VK.", file=sys.stderr)


@dataclass
class ProveStats:
    """Per-stage timings — the observability the reference lacks
    (SURVEY §5 tracing obligation)."""
    witness_s: float = 0.0
    prove_s: float = 0.0
    verify_s: float = 0.0


@dataclass
class PreparedBatch:
    """Output of the host witness stage, input of the device prove stage
    (the DP pipeline's inter-stage token)."""
    txs: List[Transaction]
    witness: List[int]
    public_signals: List[int]
    final_tree: MerkleTree
    witness_s: float = 0.0


class TxProver:
    """BatchProcessTx(batch, depth) prover with cached keys."""

    def __init__(self, cfg: RollupConfig, key_path: Optional[str] = None,
                 setup_seed: Optional[bytes] = None):
        self.cfg = cfg
        self.key_path = key_path
        self.pk: Optional[ProvingKey] = None
        self.setup_seed = setup_seed
        self.stats = ProveStats()
        self._r1cs = None   # structure cache: circuits are static

    def structure(self):
        return synthesize_batch_process_tx(
            _dummy_tx_inputs(self.cfg.batch_size, self.cfg.tree_depth),
            self.cfg.batch_size, self.cfg.tree_depth, check=False)

    def _structure_r1cs(self):
        if self._r1cs is None:
            self._r1cs = self.structure().r1cs
        return self._r1cs

    def ensure_keys(self) -> ProvingKey:
        if self.pk is not None:
            return self.pk
        r1cs = self._structure_r1cs()
        if self.key_path and os.path.exists(self.key_path):
            pk = ProvingKey.load(self.key_path)
            # cached keys go stale when circuit synthesis changes: compare
            # the STRUCTURAL digest (counts can collide across gadget
            # rewrites — the r4 Feistel rework kept n_vars)
            if pk.r1cs_digest and pk.r1cs_digest == r1cs_digest(r1cs):
                self.pk = pk
                return self.pk
            _warn_stale_key(self.key_path)
        self.pk = setup(r1cs, seed=self.setup_seed)
        if self.key_path:
            self.pk.save(self.key_path)
        return self.pk

    def prepare_batch(self, tree: MerkleTree,
                      txs: List[Transaction]) -> "PreparedBatch":
        """Host stage: assemble inputs from the tree snapshot and run the
        witness-only synthesis replay. Independent of the device, so the
        DP pipeline (batchd.run_pipeline) executes it for batch i+1 while
        batch i is proving — the final tree chains through assembly, not
        through the proof."""
        t0 = time.time()
        inputs, final_tree = assemble_batch_inputs(tree, txs)
        # witness-only replay: the R1CS is static and cached (to_coo cache
        # included), so per-proof synthesis computes just the values
        res = synthesize_batch_process_tx(
            inputs, self.cfg.batch_size, self.cfg.tree_depth, record=False)
        self.stats.witness_s = time.time() - t0
        return PreparedBatch(txs=txs, witness=res.witness,
                             public_signals=res.public_signals,
                             final_tree=final_tree,
                             witness_s=self.stats.witness_s)

    def prove_prepared(self, prep: "PreparedBatch",
                       r: Optional[int] = None, s: Optional[int] = None
                       ) -> Proof:
        """Device stage: prove + mandatory self-verify."""
        pk = self.ensure_keys()
        t0 = time.time()
        proof = prove(pk, self._structure_r1cs(), prep.witness, r=r, s=s)
        self.stats.prove_s = time.time() - t0

        t0 = time.time()
        if not verify(pk.vk, proof, prep.public_signals):
            raise RuntimeError("Invalid proof generated")  # common.ts:36-38
        self.stats.verify_s = time.time() - t0
        return proof

    def prove_batch(self, tree: MerkleTree, txs: List[Transaction],
                    r: Optional[int] = None, s: Optional[int] = None
                    ) -> Tuple[Proof, List[int], MerkleTree]:
        """Assemble inputs from the tree snapshot, synthesize the witness,
        prove, self-verify. Returns (proof, public inputs, final tree)."""
        self.ensure_keys()
        prep = self.prepare_batch(tree, txs)
        proof = self.prove_prepared(prep, r=r, s=s)
        return proof, prep.public_signals, prep.final_tree


class WithdrawProver:
    """Withdraw-circuit prover (genWithdrawVerifierProof analog)."""

    def __init__(self, key_path: Optional[str] = None,
                 setup_seed: Optional[bytes] = None):
        self.key_path = key_path
        self.pk: Optional[ProvingKey] = None
        self.setup_seed = setup_seed

    def ensure_keys(self) -> ProvingKey:
        if self.pk is not None:
            return self.pk
        r1cs = synthesize_withdraw(0, 0, check=False).r1cs
        if self.key_path and os.path.exists(self.key_path):
            pk = ProvingKey.load(self.key_path)
            if pk.r1cs_digest and pk.r1cs_digest == r1cs_digest(r1cs):
                self.pk = pk
                return self.pk
            _warn_stale_key(self.key_path)
        self.pk = setup(r1cs, seed=self.setup_seed)
        if self.key_path:
            self.pk.save(self.key_path)
        return self.pk

    def prove_withdraw(self, formatted_priv_key: int, nullifier: int,
                       r: Optional[int] = None, s: Optional[int] = None
                       ) -> Tuple[Proof, List[int]]:
        pk = self.ensure_keys()
        res = synthesize_withdraw(formatted_priv_key, nullifier)
        proof = prove(pk, res.r1cs, res.witness, r=r, s=s)
        if not verify(pk.vk, proof, res.public_signals):
            raise RuntimeError("Invalid proof generated")
        return proof, res.public_signals
