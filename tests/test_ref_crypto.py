"""Ground-truth crypto layer tests.

Mirrors the reference's differential-test strategy (SURVEY §4): known vectors
where they exist publicly, structural invariants and round-trips elsewhere
(crypto round-trips parallel operator/__tests__/utils/__tests__/crypto.test.ts).
"""

import pytest

from zkrollup.ref.keccak import keccak256
from zkrollup.ref import bn254 as bn
from zkrollup.ref import babyjubjub as bjj
from zkrollup.ref import mimc, eddsa


class TestKeccak:
    def test_known_vectors(self):
        assert keccak256(b"").hex() == (
            "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
        assert keccak256(b"abc").hex() == (
            "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")

    def test_multiblock(self):
        # > one rate block (136 bytes)
        out = keccak256(b"x" * 300)
        assert len(out) == 32


class TestMiMC:
    def test_sponge_constants_structure(self):
        cts = mimc.mimcsponge_constants()
        assert len(cts) == 220
        assert cts[0] == 0 and cts[-1] == 0
        # first nonzero constant matches circomlib 0.0.20's hardcoded value
        # (mimcsponge.circom round-constant array)
        assert cts[1] == (
            7120861356467848435263064379192047478074060781135320967663101236819528304084)

    def test_multihash_circomlib_vector(self):
        # canonical circomlib MiMCSponge vector: multiHash([1, 2])
        assert mimc.multi_hash([1, 2]) == (
            19814528709687996974327303300007262407299502847885145507292406548098437687919)

    def test_sponge_absorb_order_matters(self):
        assert mimc.multi_hash([1, 2]) != mimc.multi_hash([2, 1])

    def test_key_changes_hash(self):
        assert mimc.multi_hash([1, 2], key=1) != mimc.multi_hash([1, 2], key=0)

    def test_mimc7(self):
        h = mimc.mimc7_hash(1, 2)
        assert 0 < h < mimc.P
        assert mimc.mimc7_multi_hash([1, 2, 3]) != mimc.mimc7_multi_hash([3, 2, 1])


class TestBN254:
    def test_generators_on_curve(self):
        assert bn.g1_is_on_curve(bn.G1_GEN)
        assert bn.g2_is_on_curve(bn.G2_GEN)

    def test_group_order(self):
        assert bn.g1_mul(bn.G1_GEN, bn.R) is None
        assert bn.g2_mul(bn.G2_GEN, bn.R) is None

    def test_g1_arith(self):
        p2 = bn.g1_mul(bn.G1_GEN, 2)
        assert p2 == bn.g1_add(bn.G1_GEN, bn.G1_GEN)
        assert bn.g1_add(p2, bn.g1_neg(p2)) is None
        assert bn.g1_mul(bn.G1_GEN, 5) == bn.g1_add(p2, bn.g1_mul(bn.G1_GEN, 3))

    def test_fq2_field(self):
        a, b = (3, 5), (7, 11)
        assert bn.fq2_mul(a, bn.fq2_inv(a)) == bn.FQ2_ONE
        assert bn.fq2_mul(a, b) == bn.fq2_mul(b, a)
        assert bn.fq2_sqr(a) == bn.fq2_mul(a, a)

    def test_fq12_field(self):
        x = bn.miller_loop(bn.G1_GEN, bn.G2_GEN)
        assert bn.fq12_mul(x, bn.fq12_inv(x)) == bn.FQ12_ONE
        # frobenius is the q-power map
        assert bn.fq12_frobenius(x) == bn.fq12_pow(x, bn.Q)

    def test_pairing_bilinearity(self):
        e_ab = bn.pairing(bn.g1_mul(bn.G1_GEN, 3), bn.g2_mul(bn.G2_GEN, 5))
        e_base = bn.pairing(bn.G1_GEN, bn.G2_GEN)
        assert e_ab == bn.fq12_pow(e_base, 15)

    def test_pairing_nondegenerate(self):
        assert bn.pairing(bn.G1_GEN, bn.G2_GEN) != bn.FQ12_ONE

    def test_pairing_check(self):
        p7 = bn.g1_mul(bn.G1_GEN, 7)
        assert bn.pairing_check([(p7, bn.G2_GEN), (bn.g1_neg(p7), bn.G2_GEN)])
        assert not bn.pairing_check([(p7, bn.G2_GEN), (bn.G1_GEN, bn.G2_GEN)])


class TestBabyJubJub:
    def test_curve_params(self):
        assert bjj.is_on_curve(bjj.GENERATOR)
        assert bjj.is_on_curve(bjj.BASE8)
        assert bjj.mul(bjj.GENERATOR, 8) == bjj.BASE8
        assert bjj.ORDER == 8 * bjj.SUB_ORDER

    def test_subgroup(self):
        assert bjj.mul(bjj.BASE8, bjj.SUB_ORDER) == bjj.IDENTITY
        assert bjj.in_subgroup(bjj.BASE8)

    def test_addition_complete(self):
        p = bjj.mul(bjj.BASE8, 12345)
        assert bjj.add(p, bjj.IDENTITY) == p
        neg_p = ((-p[0]) % bjj.P, p[1])
        assert bjj.add(p, neg_p) == bjj.IDENTITY


class TestEdDSA:
    PRIV = 2405061776733509517403536564533455467716161347369255560244615885034148637482

    def test_pubkey_in_subgroup(self):
        pub = eddsa.gen_public_key(self.PRIV)
        assert bjj.in_subgroup(pub)

    def test_sign_verify_roundtrip(self):
        # message shape = formatTx output (helpers.ts:60-73)
        msg = [0, 1, 10**17, 10**15, 1]
        pub = eddsa.gen_public_key(self.PRIV)
        sig = eddsa.sign(self.PRIV, msg)
        assert eddsa.verify(msg, sig, pub)

    def test_reject_wrong_message(self):
        msg = [0, 1, 10**17, 10**15, 1]
        pub = eddsa.gen_public_key(self.PRIV)
        sig = eddsa.sign(self.PRIV, msg)
        assert not eddsa.verify([0, 1, 10**17, 10**15, 2], sig, pub)

    def test_reject_tampered_sig(self):
        msg = [0, 1, 10**17, 10**15, 1]
        pub = eddsa.gen_public_key(self.PRIV)
        sig = eddsa.sign(self.PRIV, msg)
        bad = eddsa.Signature(R8=sig.R8, S=(sig.S + 1) % bjj.SUB_ORDER)
        assert not eddsa.verify(msg, bad, pub)

    def test_reject_wrong_key(self):
        msg = [0, 1, 10**17, 10**15, 1]
        sig = eddsa.sign(self.PRIV, msg)
        other_pub = eddsa.gen_public_key(self.PRIV + 1)
        assert not eddsa.verify(msg, sig, other_pub)

    def test_ecdh_symmetry(self):
        # parity with crypto.test.ts ECDH round-trip
        priv_a, priv_b = self.PRIV, self.PRIV + 17
        pub_a = eddsa.gen_public_key(priv_a)
        pub_b = eddsa.gen_public_key(priv_b)
        assert eddsa.ecdh(priv_a, pub_b) == eddsa.ecdh(priv_b, pub_a)

    def test_gen_private_key_range(self):
        for _ in range(8):
            assert 0 <= eddsa.gen_private_key() < bn.R


class TestCipher:
    """MiMC7-CTR cipher parity (crypto.ts:95-141; crypto.test.ts:22-64)."""

    PRIV_A = 0x52F84E3F063F5F78C2FA0B8D3A5E8240F5F0C8E2A1D73B9465F30E2C19A70301 % bn.R
    PRIV_B = 0x1C3A5E8240F5F0C8E2A1D73B9465F30E2C19A70301F84E3F063F5F78C2FA0B8D % bn.R
    MSG = [1, 0, bn.R - 1, 10**18 + 7, 2**250 % bn.R]

    def test_encrypt_decrypt_identity(self):
        from zkrollup.ref import cipher
        enc = cipher.encrypt(self.MSG, self.PRIV_A)
        assert cipher.decrypt(enc, self.PRIV_A) == self.MSG

    def test_wrong_key_garbles(self):
        from zkrollup.ref import cipher
        enc = cipher.encrypt(self.MSG, self.PRIV_A)
        assert cipher.decrypt(enc, self.PRIV_B) != self.MSG

    def test_iv_is_message_hash(self):
        from zkrollup.ref import cipher
        enc = cipher.encrypt(self.MSG, self.PRIV_A)
        assert enc.iv == mimc.mimc7_multi_hash(self.MSG, 0)

    def test_ecdh_encrypt_decrypt_both_directions(self):
        # crypto.test.ts:39-55 — the two ECDH envelopes are identical and
        # either party decrypts
        from zkrollup.ref import cipher
        pub_a = eddsa.gen_public_key(self.PRIV_A)
        pub_b = eddsa.gen_public_key(self.PRIV_B)
        e1 = cipher.ecdh_encrypt(self.MSG, self.PRIV_A, pub_b)
        e2 = cipher.ecdh_encrypt(self.MSG, self.PRIV_B, pub_a)
        assert e1.iv == e2.iv and e1.msg == e2.msg
        assert cipher.ecdh_decrypt(e1, self.PRIV_A, pub_b) == self.MSG
        assert cipher.ecdh_decrypt(e1, self.PRIV_B, pub_a) == self.MSG

    def test_nonfield_message_roundtrips(self):
        # the reference never reduces ciphertext (snarkjs bigInt); integers
        # >= p round-trip exactly
        from zkrollup.ref import cipher
        msg = [bn.R + 12345, 2**300]
        enc = cipher.encrypt(msg, self.PRIV_A)
        assert cipher.decrypt(enc, self.PRIV_A) == msg
