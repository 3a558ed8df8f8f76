"""Fused Pallas G1 add/double kernels vs the generic weierstrass path.

Runs in Pallas interpret mode on the CPU test mesh; the same kernel code
compiles to Mosaic on TPU (bench path). Differential strategy per SURVEY §4.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from zkrollup.curve import g1_jax, pallas_curve
from zkrollup.curve.g1_jax import G1
from zkrollup.fields.mont import FQ
from zkrollup.fields import limbs as L
from zkrollup.ref import bn254 as ref

# the fused-kernel classes run the pallas kernels in interpret mode
# (slow); TestDispatchGate is pure logic and stays in the fast tier
pytestmark_fused = pytest.mark.slow


def _points(n, seed=0, with_inf=True):
    rng = np.random.RandomState(seed)
    pts = []
    for i in range(n):
        if with_inf and i % 7 == 3:
            pts.append(None)
        else:
            pts.append(ref.g1_mul(ref.G1_GEN, int(rng.randint(1, 1 << 30))))
    return pts


def _jac(pts):
    return g1_jax.pack_jacobian_host(pts)


def _unpack(p):
    return g1_jax.to_affine_host(p)


N = 16  # small; interpret mode is slow


@pytestmark_fused
class TestFusedAdd:
    def test_add_matches_generic(self):
        p = _jac(_points(N, seed=1))
        q = _jac(_points(N, seed=2))
        got = pallas_curve.g1_add(p, q)
        want = G1.add(p, q)
        assert _unpack(got) == _unpack(want)

    def test_add_matches_host_ints(self):
        pa, qa = _points(N, seed=3), _points(N, seed=4)
        got = _unpack(pallas_curve.g1_add(_jac(pa), _jac(qa)))
        want = [ref.g1_add(a, b) for a, b in zip(pa, qa)]
        assert got == want

    def test_double_path_in_add(self):
        """P + P must take the doubling branch."""
        pa = _points(N, seed=5, with_inf=False)
        p = _jac(pa)
        got = _unpack(pallas_curve.g1_add(p, p))
        want = [ref.g1_double(a) for a in pa]
        assert got == want

    def test_inverse_gives_infinity(self):
        pa = _points(N, seed=6, with_inf=False)
        na = [ref.g1_neg(a) for a in pa]
        got = _unpack(pallas_curve.g1_add(_jac(pa), _jac(na)))
        assert got == [None] * N

    def test_identity_cases(self):
        pa = _points(N, seed=7, with_inf=False)
        inf = _jac([None] * N)
        assert _unpack(pallas_curve.g1_add(_jac(pa), inf)) == pa
        assert _unpack(pallas_curve.g1_add(inf, _jac(pa))) == pa
        assert _unpack(pallas_curve.g1_add(inf, inf)) == [None] * N


@pytestmark_fused
class TestFusedAddZ01:
    """Specialized leaf-level add: both inputs affine-or-infinity."""

    def test_matches_host_ints(self):
        pa, qa = _points(N, seed=11), _points(N, seed=12)
        got = _unpack(pallas_curve.g1_add_z01(_jac(pa), _jac(qa)))
        want = [ref.g1_add(a, b) for a, b in zip(pa, qa)]
        assert got == want

    def test_matches_generic_z01(self):
        p = _jac(_points(N, seed=13))
        q = _jac(_points(N, seed=14))
        got = _unpack(pallas_curve.g1_add_z01(p, q))
        want = _unpack(G1._add_z01_generic(p, q))
        assert got == want

    def test_double_path(self):
        pa = _points(N, seed=15, with_inf=False)
        p = _jac(pa)
        got = _unpack(pallas_curve.g1_add_z01(p, p))
        assert got == [ref.g1_double(a) for a in pa]

    def test_inverse_gives_infinity(self):
        pa = _points(N, seed=16, with_inf=False)
        na = [ref.g1_neg(a) for a in pa]
        got = _unpack(pallas_curve.g1_add_z01(_jac(pa), _jac(na)))
        assert got == [None] * N

    def test_identity_cases(self):
        pa = _points(N, seed=17, with_inf=False)
        inf = _jac([None] * N)
        assert _unpack(pallas_curve.g1_add_z01(_jac(pa), inf)) == pa
        assert _unpack(pallas_curve.g1_add_z01(inf, _jac(pa))) == pa
        assert _unpack(pallas_curve.g1_add_z01(inf, inf)) == [None] * N

    def test_generic_z01_matches_generic_add_g2(self):
        """The generic z01 path must also hold for G2 (Fq2 leaves)."""
        from zkrollup.curve import g2_jax
        from zkrollup.curve.g2_jax import G2
        rng = np.random.RandomState(18)
        pts = [ref.g2_mul(ref.G2_GEN, int(k))
               for k in rng.randint(1, 1 << 20, size=4)] + [None]
        qts = [ref.g2_mul(ref.G2_GEN, int(k))
               for k in rng.randint(1, 1 << 20, size=4)] + [None]
        p, q = g2_jax.pack_jacobian_host(pts), g2_jax.pack_jacobian_host(qts)
        got = g2_jax.to_affine_host(G2._add_z01_generic(p, q))
        want = g2_jax.to_affine_host(G2.add(p, q))
        assert got == want


@pytestmark_fused
class TestFusedDouble:
    def test_double_matches_host(self):
        pa = _points(N, seed=8, with_inf=False)
        got = _unpack(pallas_curve.g1_double(_jac(pa)))
        assert got == [ref.g1_double(a) for a in pa]

    def test_double_infinity(self):
        assert _unpack(pallas_curve.g1_double(_jac([None] * N))) == [None] * N


class TestDispatchGate:
    def test_should_use_shapes(self):
        big = tuple(jnp.zeros((256, L.N_LIMBS), jnp.uint32)
                    for _ in range(3))
        small = tuple(jnp.zeros((4, L.N_LIMBS), jnp.uint32)
                      for _ in range(3))
        # CPU backend -> auto mode refuses
        assert not pallas_curve.should_use(big, big)
        import os
        old = pallas_curve._ENV
        pallas_curve._ENV = "1"
        try:
            assert pallas_curve.should_use(big, big)
            # MIN_BATCH = 1: even tiny batches take the fused kernel on
            # TPU (one padded-tile launch beats a ~20k-HLO generic graph)
            assert pallas_curve.should_use(small, small)
            bad_rank = tuple(jnp.zeros((L.N_LIMBS,), jnp.uint32)
                             for _ in range(3))
            assert not pallas_curve.should_use(bad_rank, bad_rank)
            mismatched = tuple(
                jnp.zeros((512, L.N_LIMBS), jnp.uint32) for _ in range(3))
            assert not pallas_curve.should_use(big, mismatched)
        finally:
            pallas_curve._ENV = old


def _z01(pts):
    """affine-or-infinity as (x, y, z) with z in {0, 1} exactly."""
    return g1_jax.pack_jacobian_host(pts)


@pytestmark_fused
class TestFusedMixedAdd:
    def test_madd_matches_host_ints(self):
        pa = _points(N, seed=21)           # Jacobian side (incl. inf)
        qa = _points(N, seed=22)           # affine side (incl. inf)
        got = _unpack(pallas_curve.g1_madd(_jac(pa), _z01(qa)))
        want = [ref.g1_add(a, b) for a, b in zip(pa, qa)]
        assert got == want

    def test_madd_double_path(self):
        pa = _points(N, seed=23, with_inf=False)
        got = _unpack(pallas_curve.g1_madd(_jac(pa), _z01(pa)))
        assert got == [ref.g1_double(a) for a in pa]

    def test_madd_nonunit_z_on_p(self):
        # the Jacobian side with Z != 1: p = a + b (generic add), then
        # madd(p, c) must equal a + b + c
        pa = _points(N, seed=24, with_inf=False)
        pb = _points(N, seed=25, with_inf=False)
        pc = _points(N, seed=26)
        p = G1.add(_jac(pa), _jac(pb))
        got = _unpack(pallas_curve.g1_madd(p, _z01(pc)))
        want = [ref.g1_add(ref.g1_add(a, b), c)
                for a, b, c in zip(pa, pb, pc)]
        assert got == want

    def test_madd_nd_matches_on_distinct(self):
        pa = _points(N, seed=27)
        qa = _points(N, seed=28)
        got = _unpack(pallas_curve.g1_madd_nd(_jac(pa), _z01(qa)))
        want = [ref.g1_add(a, b) for a, b in zip(pa, qa)]
        assert got == want

    def test_madd_nd_inverse_gives_infinity(self):
        pa = _points(N, seed=29, with_inf=False)
        na = [ref.g1_neg(a) for a in pa]
        got = _unpack(pallas_curve.g1_madd_nd(_jac(pa), _z01(na)))
        assert got == [None] * N


@pytestmark_fused
class TestFusedAddNd:
    def test_add_nd_matches_on_distinct(self):
        pa = _points(N, seed=31)
        qa = _points(N, seed=32)
        got = _unpack(pallas_curve.g1_add_nd(_jac(pa), _jac(qa)))
        want = [ref.g1_add(a, b) for a, b in zip(pa, qa)]
        assert got == want

    def test_add_nd_inverse_and_identity(self):
        pa = _points(N, seed=33, with_inf=False)
        na = [ref.g1_neg(a) for a in pa]
        assert _unpack(pallas_curve.g1_add_nd(_jac(pa), _jac(na))) == [None] * N
        inf = _jac([None] * N)
        assert _unpack(pallas_curve.g1_add_nd(_jac(pa), inf)) == pa
        assert _unpack(pallas_curve.g1_add_nd(inf, _jac(pa))) == pa
