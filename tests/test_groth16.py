"""Groth16 end-to-end: setup -> prove -> verify on TPU kernels.

Covers the role of the reference's proof-path tests
(contracts/__tests__/withdrawverifier.test.ts:12-69 — real proofs accepted,
tampered proofs/nullifiers rejected) without an EVM: our verify() is the
same pairing acceptance oracle the contracts implement.
"""

import numpy as np
import pytest

from zkrollup.r1cs.builder import Builder
from zkrollup.r1cs.circuits import synthesize_withdraw
from zkrollup.groth16 import setup, prove, verify
from zkrollup.groth16.keys import Proof, ProvingKey
from zkrollup.groth16.qap import eval_at_tau, to_coo, domain_for
from zkrollup.ref import bn254 as ref, eddsa
from zkrollup.ref.bn254 import R as FR_MOD

SEED = b"zkrollup-test-seed"


def cubic_builder(x=3, y=5, check=True):
    """out = x^3 + y with private x, public y."""
    bld = Builder(check=check)
    out = bld.alloc_output_deferred()
    ypub = bld.alloc_public_input(y)
    xv = bld.alloc(x)
    x3 = bld.mul(bld.mul(xv, xv), xv)
    bld.bind_output(out, x3 + ypub)
    return bld


@pytest.fixture(scope="session")
def cubic_pk():
    return setup(cubic_builder().r1cs(), seed=SEED)


@pytest.fixture(scope="session")
def cubic_proof(cubic_pk):
    bld = cubic_builder()
    proof = prove(cubic_pk, bld.r1cs(), bld.witness(), r=7, s=9)
    return proof, bld.public_signals()


class TestQap:
    def test_eval_at_tau_matches_direct_lagrange(self):
        """Cross-check A_i(tau) against an independent O(m^2)-free Lagrange
        evaluation: L_j(tau) = prod_{k!=j} (tau - w^k)/(w^j - w^k)."""
        from zkrollup.groth16.qap import domain_omega
        r1cs = cubic_builder().r1cs()
        tau = 123456789
        a_t, b_t, c_t, m, z_tau = eval_at_tau(r1cs, tau)
        assert z_tau == (pow(tau, m, FR_MOD) - 1) % FR_MOD
        log_m = m.bit_length() - 1
        omega = domain_omega(log_m)
        pts = [pow(omega, j, FR_MOD) for j in range(m)]

        def lagrange(j):
            num, den = 1, 1
            for k in range(m):
                if k == j:
                    continue
                num = num * (tau - pts[k]) % FR_MOD
                den = den * (pts[j] - pts[k]) % FR_MOD
            return num * pow(den, FR_MOD - 2, FR_MOD) % FR_MOD

        # A for each variable: sum of constraint coeffs * L_j + binding rows
        nc = r1cs.n_constraints
        for var in range(r1cs.n_vars):
            expect = 0
            for j, (A, _, _) in enumerate(r1cs.constraints):
                if var in A:
                    expect = (expect + A[var] * lagrange(j)) % FR_MOD
            if var < r1cs.n_public:
                expect = (expect + lagrange(nc + var)) % FR_MOD
            assert a_t[var] == expect

    def test_coo_row_coverage(self):
        r1cs = cubic_builder().r1cs()
        coo = to_coo(r1cs)
        log_m, m = domain_for(r1cs)
        assert coo.m == m
        # binding rows present for every public signal (incl. ONE)
        npub = r1cs.n_public
        nc = r1cs.n_constraints
        binding = coo.a_row >= nc
        assert binding.sum() == npub
        assert set(coo.a_row[binding].tolist()) == {nc + s for s in range(npub)}


class TestCubic:
    def test_proof_verifies(self, cubic_proof, cubic_pk):
        proof, pub = cubic_proof
        assert verify(cubic_pk.vk, proof, pub)

    def test_deterministic_with_pinned_rs(self, cubic_pk, cubic_proof):
        bld = cubic_builder()
        p2 = prove(cubic_pk, bld.r1cs(), bld.witness(), r=7, s=9)
        assert p2 == cubic_proof[0]

    def test_fresh_blinding_changes_proof_but_verifies(self, cubic_pk,
                                                       cubic_proof):
        bld = cubic_builder()
        p2 = prove(cubic_pk, bld.r1cs(), bld.witness(), r=11, s=13)
        assert p2 != cubic_proof[0]
        assert verify(cubic_pk.vk, p2, bld.public_signals())

    def test_wrong_public_signal_rejected(self, cubic_proof, cubic_pk):
        proof, pub = cubic_proof
        bad = list(pub)
        bad[0] = (bad[0] + 1) % FR_MOD
        assert not verify(cubic_pk.vk, proof, bad)

    def test_tampered_points_rejected(self, cubic_proof, cubic_pk):
        proof, pub = cubic_proof
        # off-curve a
        bad_a = Proof(a=(proof.a[0], (proof.a[1] + 1) % ref.Q), b=proof.b,
                      c=proof.c)
        assert not verify(cubic_pk.vk, bad_a, pub)
        # swapped c for a valid-but-wrong point (the generator)
        bad_c = Proof(a=proof.a, b=proof.b, c=ref.G1_GEN)
        assert not verify(cubic_pk.vk, bad_c, pub)

    def test_wrong_witness_fails_constraint_check(self, cubic_pk):
        bld = cubic_builder()
        w = bld.witness()
        w[-1] = (w[-1] + 1) % FR_MOD  # corrupt an internal wire
        proof = prove(cubic_pk, bld.r1cs(), w, r=7, s=9)
        assert not verify(cubic_pk.vk, proof, bld.public_signals())

    def test_key_roundtrip(self, cubic_pk, cubic_proof, tmp_path):
        path = str(tmp_path / "pk.npz")
        cubic_pk.save(path)
        pk2 = ProvingKey.load(path)
        assert pk2.vk == cubic_pk.vk
        assert pk2.n_vars == cubic_pk.n_vars
        bld = cubic_builder()
        p2 = prove(pk2, bld.r1cs(), bld.witness(), r=7, s=9)
        assert p2 == cubic_proof[0]
        assert verify(pk2.vk, p2, bld.public_signals())

    def test_setup_deterministic(self, cubic_pk):
        pk2 = setup(cubic_builder().r1cs(), seed=SEED)
        assert pk2.vk == cubic_pk.vk
        assert np.array_equal(pk2.a_g1[0], cubic_pk.a_g1[0])
        assert np.array_equal(pk2.h_g1[0], cubic_pk.h_g1[0])


class TestWithdrawCircuit:
    """The minimum end-to-end slice (SURVEY §7.2): withdraw circuit proof
    against our pairing verifier — same acceptance role as
    WithdrawVerifier.sol."""

    PRIV = 41516261718191101
    NULLIFIER = 31337

    @pytest.fixture(scope="class")
    def wpk(self):
        return setup(synthesize_withdraw(0, 0, check=False).r1cs, seed=SEED)

    @pytest.fixture(scope="class")
    def wproof(self, wpk):
        fpriv = eddsa.format_priv_key_for_babyjub(self.PRIV)
        res = synthesize_withdraw(fpriv, self.NULLIFIER)
        proof = prove(wpk, res.r1cs, res.witness, r=3, s=4)
        return proof, res.public_signals

    def test_public_signals_are_pubkey_and_nullifier(self, wproof):
        _, pub = wproof
        assert pub[:2] == list(eddsa.gen_public_key(self.PRIV))
        assert pub[2] == self.NULLIFIER

    def test_proof_accepted(self, wpk, wproof):
        proof, pub = wproof
        assert verify(wpk.vk, proof, pub)

    def test_tampered_nullifier_rejected(self, wpk, wproof):
        proof, pub = wproof
        assert not verify(wpk.vk, proof, [pub[0], pub[1], pub[2] + 1])

    def test_wrong_pubkey_rejected(self, wpk, wproof):
        proof, pub = wproof
        other = eddsa.gen_public_key(999)
        assert not verify(wpk.vk, proof, [other[0], other[1], pub[2]])


class TestBackendParity:
    """prove() runs on three engines — JAX device pipeline, native host
    engine, distributed mesh — which must produce IDENTICAL proofs with
    pinned (r, s). (auto-dispatch picks host on the CPU backend, so the
    device pipeline needs explicit coverage here.)"""

    @pytest.mark.slow
    def test_host_and_device_bit_identical(self, cubic_pk):
        bld = cubic_builder()
        p_dev = prove(cubic_pk, bld.r1cs(), bld.witness(), r=7, s=9,
                      backend="device")
        from zkrollup.native import engine
        if not engine.available():
            pytest.skip("libzkhost not built")
        p_host = prove(cubic_pk, bld.r1cs(), bld.witness(), r=7, s=9,
                       backend="host")
        assert (p_dev.a, p_dev.b, p_dev.c) == (p_host.a, p_host.b, p_host.c)
        assert verify(cubic_pk.vk, p_dev, bld.public_signals())
