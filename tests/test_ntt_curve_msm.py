"""Differential tests for NTT, curve kernels and MSM vs the Python oracle.

Sizes are deliberately tiny: the CPU backend pays real XLA compile cost per
instance; bit-exactness at n=16..64 exercises every code path (padding,
infinity, repeated digits, doubling branches) that production sizes hit.
"""

import random
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zkrollup.ref import bn254 as ref
from zkrollup.fields.mont import FR
from zkrollup.fields import limbs as L
from zkrollup.ntt.ntt import (ntt_ints, domain_root, coset_ntt_mont,
                              coset_intt_mont, ROOT_OF_UNITY, TWO_ADICITY)
from zkrollup.curve import g1_jax, g2_jax
from zkrollup.msm.msm import msm, window_digits

random.seed(23)


class TestNTT:
    def test_root_of_unity_order(self):
        assert pow(ROOT_OF_UNITY, 1 << TWO_ADICITY, FR.p) == 1
        assert pow(ROOT_OF_UNITY, 1 << (TWO_ADICITY - 1), FR.p) != 1

    def test_forward_matches_naive_dft(self):
        n = 16
        xs = [random.randrange(FR.p) for _ in range(n)]
        w = domain_root(4)
        want = [sum(xs[j] * pow(w, i * j, FR.p) for j in range(n)) % FR.p
                for i in range(n)]
        assert ntt_ints(xs) == want

    def test_inverse_roundtrip(self):
        xs = [random.randrange(FR.p) for _ in range(32)]
        assert ntt_ints(ntt_ints(xs), inverse=True) == xs

    def test_coset_roundtrip(self):
        xs = [random.randrange(FR.p) for _ in range(16)]
        a = jnp.asarray(FR.to_mont_host(xs))
        rt = FR.from_mont_host(np.asarray(coset_intt_mont(coset_ntt_mont(a))))
        assert rt == xs

    def test_convolution(self):
        n = 8
        xs = [random.randrange(FR.p) for _ in range(n)]
        ys = [random.randrange(FR.p) for _ in range(n)]
        prod = [(u * v) % FR.p for u, v in zip(ntt_ints(xs), ntt_ints(ys))]
        got = ntt_ints(prod, inverse=True)
        want = [0] * n
        for i in range(n):
            for j in range(n):
                want[(i + j) % n] = (want[(i + j) % n] + xs[i] * ys[j]) % FR.p
        assert got == want


def _g1_batch(points):
    return g1_jax.pack_jacobian_host(points)


@pytest.mark.slow  # compile-heavy curve kernel tier
class TestG1:
    def test_add_special_cases(self):
        ks = [random.randrange(1, ref.R) for _ in range(4)]
        ps = [ref.g1_mul(ref.G1_GEN, k) for k in ks]
        qs = [ref.g1_mul(ref.G1_GEN, k + 3) for k in ks]
        ps += [ps[0], ps[1], ps[2], None]
        qs += [ref.g1_neg(ps[0]), ps[1], None, qs[3]]
        got = g1_jax.to_affine_host(g1_jax.G1.add(_g1_batch(ps), _g1_batch(qs)))
        assert got == [ref.g1_add(p, q) for p, q in zip(ps, qs)]

    def test_double(self):
        ps = [ref.g1_mul(ref.G1_GEN, k) for k in (2, 9, 77)] + [None]
        got = g1_jax.to_affine_host(g1_jax.G1.double(_g1_batch(ps)))
        assert got == [ref.g1_double(p) for p in ps]

    def test_scalar_mul(self):
        ps = [ref.g1_mul(ref.G1_GEN, k) for k in (3, 8, 101)]
        scal = [5, 0, ref.R - 1]
        bits = jnp.asarray(
            np.stack([[(s >> (253 - i)) & 1 for i in range(254)]
                      for s in scal]), jnp.uint32)
        got = g1_jax.to_affine_host(
            g1_jax.G1.scalar_mul_bits(_g1_batch(ps), bits))
        assert got == [ref.g1_mul(p, s) for p, s in zip(ps, scal)]

    def test_mixed_add(self):
        ps = [ref.g1_mul(ref.G1_GEN, k) for k in (4, 6)] + [None]
        qs = [ref.g1_mul(ref.G1_GEN, k) for k in (10, 6)] + [ref.G1_GEN]
        x, y, inf = g1_jax.pack_affine_host(qs)
        got = g1_jax.to_affine_host(g1_jax.G1.mixed_add(
            _g1_batch(ps), (jnp.asarray(x), jnp.asarray(y), jnp.asarray(inf))))
        assert got == [ref.g1_add(p, q) for p, q in zip(ps, qs)]


@pytest.mark.slow  # compile-heavy curve kernel tier
class TestG2:
    def test_add_double(self):
        ks = [random.randrange(1, ref.R) for _ in range(3)]
        ps = [ref.g2_mul(ref.G2_GEN, k) for k in ks] + [None]
        qs = [ref.g2_mul(ref.G2_GEN, k * 3 + 1) for k in ks] + [ref.G2_GEN]
        P = g2_jax.pack_jacobian_host(ps)
        Q = g2_jax.pack_jacobian_host(qs)
        assert g2_jax.to_affine_host(g2_jax.G2.add(P, Q)) == [
            ref.g2_add(p, q) for p, q in zip(ps, qs)]
        assert g2_jax.to_affine_host(g2_jax.G2.double(P)) == [
            ref.g2_double(p) for p in ps]


class TestMSM:
    def test_window_digits(self):
        s = (0xABCD << 16) | 0x1234
        digs = np.asarray(window_digits(
            jnp.asarray(L.ints_to_limbs([s])), 8, 32))[:, 0]
        assert digs[0] == 0x34 and digs[1] == 0x12
        assert digs[2] == 0xCD and digs[3] == 0xAB

    @pytest.mark.slow  # compiles the full scan-MSM program
    def test_g1_msm_small(self):
        n = 32
        scalars = [random.randrange(ref.R) for _ in range(n - 3)] + [0, 1, ref.R - 1]
        pts = [ref.g1_mul(ref.G1_GEN, random.randrange(1, ref.R))
               for _ in range(n - 1)] + [None]
        x, y, inf = g1_jax.pack_affine_host(pts)
        res = jax.jit(partial(msm, g1_jax.G1, c=4))(
            (jnp.asarray(x), jnp.asarray(y), jnp.asarray(inf)),
            jnp.asarray(L.ints_to_limbs(scalars)))
        got = g1_jax.to_affine_host(
            jax.tree_util.tree_map(lambda a: a[None], res))[0]
        assert got == ref.g1_msm(pts[:-1], scalars[:-1])

    def test_g1_msm_repeated_digits_and_padding(self):
        # 24 points (pads to 32), heavy digit collisions incl. zeros
        sc = [7] * 8 + [1] * 8 + [0] * 4 + [15] * 4
        pts = [ref.g1_mul(ref.G1_GEN, i + 1) for i in range(len(sc))]
        x, y, inf = g1_jax.pack_affine_host(pts)
        res = jax.jit(partial(msm, g1_jax.G1, c=4))(
            (jnp.asarray(x), jnp.asarray(y), jnp.asarray(inf)),
            jnp.asarray(L.ints_to_limbs(sc)))
        got = g1_jax.to_affine_host(
            jax.tree_util.tree_map(lambda a: a[None], res))[0]
        assert got == ref.g1_msm(pts, sc)

    def test_g1_msm_both_tree_modes_agree(self, monkeypatch):
        """The affine (batched-inversion) and Jacobian (fused-kernel)
        merge trees are interchangeable strategies; assert both against
        the host ground truth on a collision-heavy input."""
        from zkrollup.msm import msm as msm_mod
        sc = [5] * 6 + [0, 1, ref.R - 1] + [11] * 7
        pts = [ref.g1_mul(ref.G1_GEN, i + 2) for i in range(len(sc) - 1)]
        pts += [None]
        x, y, inf = g1_jax.pack_affine_host(pts)
        pa = (jnp.asarray(x), jnp.asarray(y), jnp.asarray(inf))
        scl = jnp.asarray(L.ints_to_limbs(sc))
        want = ref.g1_msm(pts[:-1], sc[:-1])
        for mode in ("affine", "jacobian"):
            monkeypatch.setattr(msm_mod, "_TREE_MODE", mode)
            res = jax.jit(partial(msm, g1_jax.G1, c=3))(pa, scl)
            got = g1_jax.to_affine_host(
                jax.tree_util.tree_map(lambda a: a[None], res))[0]
            assert got == want, f"tree mode {mode} mismatch"

    def test_g2_msm_small(self):
        n = 8
        sc = [random.randrange(ref.R) for _ in range(n)]
        pts = [ref.g2_mul(ref.G2_GEN, random.randrange(1, ref.R))
               for _ in range(n)]
        x, y, inf = g2_jax.pack_affine_host(pts)
        pa = ((jnp.asarray(x[0]), jnp.asarray(x[1])),
              (jnp.asarray(y[0]), jnp.asarray(y[1])), jnp.asarray(inf))
        res = jax.jit(partial(msm, g2_jax.G2, c=4))(
            pa, jnp.asarray(L.ints_to_limbs(sc)))
        got = g2_jax.to_affine_host(
            jax.tree_util.tree_map(lambda a: a[None], res))[0]
        want = None
        for p, s in zip(pts, sc):
            want = ref.g2_add(want, ref.g2_mul(p, s))
        assert got == want
