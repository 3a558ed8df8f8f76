"""Differential tests: native C++ engine (libzkhost) vs pure-Python ground
truth (zkrollup/ref/*). Mirrors the reference's differential-test strategy
(SURVEY §4: same computation implemented twice, asserted equal) at the
host-native boundary."""

import random

import pytest

from zkrollup.native import engine as ng
from zkrollup.ref import bn254 as bn
from zkrollup.ref import babyjubjub as bjj
from zkrollup.ref import eddsa
from zkrollup.ref import keccak as pk
from zkrollup.ref import mimc

pytestmark = pytest.mark.skipif(
    not ng.available(), reason="native engine not built")


class TestKeccak:
    def test_vectors(self):
        assert ng.keccak256(b"") == pk.keccak256(b"")
        assert ng.keccak256(b"abc") == pk.keccak256(b"abc")
        assert ng.keccak256(b"mimcsponge") == pk.keccak256(b"mimcsponge")

    def test_long_input(self):
        data = bytes(range(256)) * 3  # multi-block absorb
        assert ng.keccak256(data) == pk.keccak256(data)


class TestMimc:
    def test_multihash(self):
        random.seed(1)
        for n in (1, 2, 4, 7):
            vals = [random.randrange(bn.R) for _ in range(n)]
            assert ng.mimc_multi_hash(vals) == mimc.multi_hash_py(vals)

    def test_multihash_key(self):
        vals = [5, 6, 7]
        assert (ng.mimc_multi_hash(vals, key=99)
                == mimc.multi_hash_py(vals, key=99))

    def test_multihash_many(self):
        random.seed(2)
        rows = [[random.randrange(bn.R) for _ in range(2)] for _ in range(8)]
        assert (ng.mimc_multi_hash_many(rows)
                == [mimc.multi_hash_py(r) for r in rows])

    def test_mimc7(self):
        assert ng.mimc7_hash(3, 4) == mimc.mimc7_hash(3, 4)
        vals = [11, 22, 33]
        assert ng.mimc7_multi_hash(vals) == mimc.mimc7_multi_hash(vals)

    def test_dispatch_is_native(self):
        # the Python-facing multi_hash must agree with the pure version
        vals = [1, 2, 3, 4]
        assert mimc.multi_hash(vals) == mimc.multi_hash_py(vals)


class TestCurve:
    def test_g1_ops(self):
        random.seed(3)
        k1, k2 = (random.randrange(1, bn.R) for _ in range(2))
        p1, p2 = bn.g1_mul(bn.G1_GEN, k1), bn.g1_mul(bn.G1_GEN, k2)
        assert ng.g1_add(p1, p2) == bn.g1_add(p1, p2)
        assert ng.g1_add(p1, p1) == bn.g1_double(p1)
        assert ng.g1_mul(bn.G1_GEN, k1) == p1
        assert ng.g1_mul(p1, 0) is None
        assert ng.g1_add(p1, None) == p1
        assert ng.g1_add(p1, bn.g1_neg(p1)) is None

    def test_g2_ops(self):
        random.seed(4)
        k = random.randrange(1, bn.R)
        q = bn.g2_mul(bn.G2_GEN, k)
        assert ng.g2_mul(bn.G2_GEN, k) == q
        assert ng.g2_add(q, q) == bn.g2_double(q)
        assert ng.g2_add(q, bn.g2_neg(q)) is None

    def test_g1_msm(self):
        random.seed(5)
        pts = [bn.g1_mul(bn.G1_GEN, random.randrange(1, bn.R))
               for _ in range(6)]
        sc = [random.randrange(bn.R) for _ in range(6)]
        assert ng.g1_msm(pts, sc) == bn.g1_msm(pts, sc)

    def test_rejects_out_of_range_coords(self):
        bad = (bn.Q, 2)  # x == q is out of range
        with pytest.raises(ValueError):
            ng.g1_add(bad, bn.G1_GEN)


class TestBabyJubJub:
    def test_mul_matches(self):
        assert ng.bjj_mul(bjj.BASE8, 12345) == bjj.mul_py(bjj.BASE8, 12345)

    def test_raw_scalar_over_256_bits(self):
        big = 8 * (bn.R - 3)  # the hm*8 verify path exceeds 256 bits
        assert ng.bjj_mul(bjj.BASE8, big) == bjj.mul_py(bjj.BASE8, big)

    def test_add(self):
        p = bjj.mul_py(bjj.BASE8, 7)
        assert ng.bjj_add(p, bjj.BASE8) == bjj.add(p, bjj.BASE8)
        assert ng.bjj_add(p, bjj.IDENTITY) == p

    def test_on_curve(self):
        assert ng.bjj_on_curve(bjj.BASE8)
        assert not ng.bjj_on_curve((1, 1))

    def test_eddsa_roundtrip_through_dispatch(self):
        # sign/verify exercise native bjj mul + native MiMC end to end
        priv = 123456789
        msg = [1, 2, 3, 4, 5]
        sig = eddsa.sign(priv, msg)
        assert eddsa.verify(msg, sig, eddsa.gen_public_key(priv))
        assert not eddsa.verify([9] + msg[1:], sig,
                                eddsa.gen_public_key(priv))


class TestPairing:
    def test_pairing_matches_python(self):
        e_n = ng.pairing(bn.G1_GEN, bn.G2_GEN)
        e_p = bn.pairing(bn.G1_GEN, bn.G2_GEN)
        assert e_n == (tuple(e_p[0]) + tuple(e_p[1]))

    def test_bilinearity(self):
        a, b = 6, 11
        assert ng.pairing_check(
            [(bn.g1_mul(bn.G1_GEN, a), bn.g2_mul(bn.G2_GEN, b)),
             (bn.g1_neg(bn.g1_mul(bn.G1_GEN, a * b)), bn.G2_GEN)])

    def test_nondegenerate(self):
        assert not ng.pairing_check([(bn.G1_GEN, bn.G2_GEN)])

    def test_rejects_off_curve(self):
        with pytest.raises(ValueError):
            ng.pairing_check([((1, 1), bn.G2_GEN)])
