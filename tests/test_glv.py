"""GLV endomorphism decomposition + GLV MSM vs the plain 256-bit MSM."""

import random

import numpy as np
import pytest
import jax.numpy as jnp

from zkrollup.msm import glv
from zkrollup.msm.msm import msm
from zkrollup.fields import limbs as L
from zkrollup.curve import g1_jax
from zkrollup.ref import bn254 as ref
from zkrollup.ref.bn254 import R as FR_MOD

class TestDecompose:
    def test_identity_holds(self):
        random.seed(1)
        for _ in range(200):
            k = random.randrange(FR_MOD)
            k1, k2 = glv.decompose(k)
            assert (k1 + k2 * glv.LAMBDA) % FR_MOD == k

    def test_halves_are_short(self):
        random.seed(2)
        for _ in range(200):
            k = random.randrange(FR_MOD)
            k1, k2 = glv.decompose(k)
            assert abs(k1) < (1 << glv.GLV_BITS)
            assert abs(k2) < (1 << glv.GLV_BITS)

    def test_endomorphism_is_lambda(self):
        p = ref.g1_mul(ref.G1_GEN, 987654321)
        phi = (glv.BETA * p[0] % ref.Q, p[1])
        assert ref.g1_is_on_curve(phi)
        assert phi == ref.g1_mul(p, glv.LAMBDA)

    def test_edge_scalars(self):
        for k in (0, 1, FR_MOD - 1, glv.LAMBDA, FR_MOD - glv.LAMBDA):
            k1, k2 = glv.decompose(k)
            assert (k1 + k2 * glv.LAMBDA) % FR_MOD == k % FR_MOD


class TestNativeDecompose:
    def test_native_matches_identity_and_bounds(self):
        """The native (C++) decomposition may pick a different (equally
        valid) lattice point than the Python rounding; assert the identity
        and the size bound, not equality."""
        from zkrollup.native import engine
        if not engine.available():
            pytest.skip("native engine not built")
        random.seed(11)
        sc = [random.randrange(FR_MOD) for _ in range(64)] + [0, 1, FR_MOD - 1]
        abs_l, neg = engine.glv_decompose_batch(sc)
        n = len(sc)
        k1s = L.limbs_to_ints(abs_l[:n])
        k2s = L.limbs_to_ints(abs_l[n:])
        for i, k in enumerate(sc):
            k1 = -k1s[i] if neg[i, 0] else k1s[i]
            k2 = -k2s[i] if neg[n + i, 0] else k2s[i]
            assert (k1 + k2 * glv.LAMBDA) % FR_MOD == k
            assert abs(k1) < (1 << glv.GLV_BITS)
            assert abs(k2) < (1 << glv.GLV_BITS)


@pytest.mark.slow  # compiles the full scan-MSM program
class TestGlvMsm:
    def _setup(self, n, seed):
        rng = np.random.RandomState(seed)
        ks = [int(v) for v in rng.randint(1, 1 << 24, size=n)]
        scalars = [random.randrange(FR_MOD) for _ in range(n)]
        pts = [ref.g1_mul(ref.G1_GEN, k) for k in ks]
        return pts, ks, scalars

    def test_matches_plain_msm(self):
        random.seed(3)
        pts, _, scalars = self._setup(32, 4)
        pa = g1_jax.pack_affine_host(pts)
        want = msm(g1_jax.G1, tuple(jnp.asarray(a) for a in pa),
                   jnp.asarray(L.ints_to_limbs(scalars)), c=4)
        got = glv.msm_glv(pa, scalars, c=4)
        unpack = lambda p: g1_jax.to_affine_host(
            tuple(np.asarray(x).reshape(1, L.N_LIMBS) for x in p))[0]
        assert unpack(got) == unpack(want)

    def test_matches_host_ground_truth(self):
        random.seed(5)
        pts, ks, scalars = self._setup(16, 6)
        got = glv.msm_glv(g1_jax.pack_affine_host(pts), scalars, c=4)
        affine = g1_jax.to_affine_host(
            tuple(np.asarray(x).reshape(1, L.N_LIMBS) for x in got))[0]
        total = sum(k * s for k, s in zip(ks, scalars)) % FR_MOD
        assert affine == ref.g1_mul(ref.G1_GEN, total)

    def test_with_infinity_and_zero_scalars(self):
        random.seed(7)
        pts = [ref.g1_mul(ref.G1_GEN, 5), None, ref.g1_mul(ref.G1_GEN, 7)]
        scalars = [3, 11, 0]
        got = glv.msm_glv(g1_jax.pack_affine_host(pts), scalars, c=4)
        affine = g1_jax.to_affine_host(
            tuple(np.asarray(x).reshape(1, L.N_LIMBS) for x in got))[0]
        assert affine == ref.g1_mul(ref.G1_GEN, 15)


@pytest.mark.slow  # compiles the full scan-MSM program
class TestHostCombineMsm:
    def test_matches_device_msm(self):
        # msm_host_combine (device window sums + host Horner) == msm()
        import random
        import jax.numpy as jnp
        from zkrollup.ref import bn254 as ref
        from zkrollup.curve import g1_jax
        from zkrollup.fields import limbs as L
        from zkrollup.msm.msm import msm, msm_host_combine
        random.seed(21)
        n = 32
        pts = [ref.g1_mul(ref.G1_GEN, random.randrange(1, ref.R))
               for _ in range(n)]
        pts[5] = None
        sc_int = [random.randrange(ref.R) for _ in range(n)]
        sc_int[0] = 0
        x, y, inf = g1_jax.pack_affine_host(pts)
        pa = (jnp.asarray(x), jnp.asarray(y), jnp.asarray(inf))
        sc = jnp.asarray(L.ints_to_limbs(sc_int))
        a = msm_host_combine(g1_jax.G1, pa, sc, c=5)
        b = msm(g1_jax.G1, pa, sc, c=5)
        to_pt = lambda r: g1_jax.to_affine_host(
            tuple(jnp.asarray(t).reshape(1, 16) for t in r))[0]
        assert to_pt(a) == to_pt(b)
