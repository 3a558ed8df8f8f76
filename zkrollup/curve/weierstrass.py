"""Batched short-Weierstrass (y^2 = x^3 + b) Jacobian point kernels,
generic over the coordinate field (Fq for G1, Fq2 for G2).

This is the elliptic-curve engine under the Groth16 MSMs (websnark's
multiexp tables A/B1/B2/C/hExps — SURVEY §2.4, §3.3). Everything is
branch-free: unified add computes both the add and double paths and
selects by masks, so a whole batch of heterogeneous cases (P=Q, P=-Q,
infinity on either side) is one fused VPU pass. Infinity is Z == 0.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..fields.mont import FQ
from ..fields import limbs as L
from ..fields import fq2


class FqOps:
    """Adapter giving plain-Fq limb arrays the same interface fq2 exposes."""
    @staticmethod
    def add(a, b): return FQ.add(a, b)
    @staticmethod
    def sub(a, b): return FQ.sub(a, b)
    @staticmethod
    def neg(a): return FQ.neg(a)
    @staticmethod
    def mul(a, b): return FQ.mont_mul(a, b)
    @staticmethod
    def sqr(a): return FQ.mont_mul(a, a)
    @staticmethod
    def is_zero(a): return L.is_zero(a)
    @staticmethod
    def inv(a): return FQ.mont_inv(a)
    @staticmethod
    def select(c, a, b): return L.select(c, a, b)
    @staticmethod
    def zeros(batch): return jnp.zeros(batch + (L.N_LIMBS,), jnp.uint32)
    @staticmethod
    def one(batch):
        return jnp.broadcast_to(FQ.one_mont, batch + (L.N_LIMBS,))
    @staticmethod
    def broadcast_to(a, batch):
        return jnp.broadcast_to(a, batch + (L.N_LIMBS,))
    @staticmethod
    def batch_shape(a): return a.shape[:-1]


class Fq2Ops:
    add = staticmethod(fq2.add)
    sub = staticmethod(fq2.sub)
    neg = staticmethod(fq2.neg)
    mul = staticmethod(fq2.mul)
    sqr = staticmethod(fq2.sqr)
    inv = staticmethod(fq2.inv)
    is_zero = staticmethod(fq2.is_zero)
    select = staticmethod(fq2.select)
    zeros = staticmethod(fq2.zeros)
    broadcast_to = staticmethod(fq2.broadcast_to)
    @staticmethod
    def one(batch):
        return (jnp.broadcast_to(FQ.one_mont, batch + (L.N_LIMBS,)),
                jnp.zeros(batch + (L.N_LIMBS,), jnp.uint32))
    @staticmethod
    def batch_shape(a): return a[0].shape[:-1]


def _fmap(fn, *xs):
    return jax.tree_util.tree_map(fn, *xs)


def batch_inverse(F, d):
    """Batched field inversion with ONE Fermat inversion: a log-depth
    product tree (upsweep m-1 muls, downsweep 2(m-1) muls) — Montgomery's
    trick restructured to be work-efficient AND parallel (a Hillis-Steele
    prefix-product would cost m*log m muls). d: batch of field elements.
    Elements must be nonzero (callers mask zero lanes to 1 first); lengths
    that aren't powers of two are padded with ones."""
    m = jax.tree_util.tree_leaves(d)[0].shape[0]
    m_pad = 1 << max((m - 1).bit_length(), 0)
    if m_pad != m:
        ones = F.one((m_pad - m,))
        d = _fmap(lambda a, o: jnp.concatenate([a, o], axis=0), d, ones)
    levels = []
    cur = d
    while jax.tree_util.tree_leaves(cur)[0].shape[0] > 1:
        levels.append(cur)
        cur = F.mul(_fmap(lambda a: a[0::2], cur),
                    _fmap(lambda a: a[1::2], cur))
    inv = F.inv(cur)                      # (1, ...) total product
    for lvl in reversed(levels):
        left = _fmap(lambda a: a[0::2], lvl)
        right = _fmap(lambda a: a[1::2], lvl)
        inv_l = F.mul(inv, right)
        inv_r = F.mul(inv, left)
        inv = _fmap(
            lambda l, r: jnp.stack([l, r], axis=1).reshape(
                (l.shape[0] * 2,) + l.shape[1:]), inv_l, inv_r)
    if m_pad != m:
        inv = _fmap(lambda a: a[:m], inv)
    return inv


def affine_add_batch(curve, p, q):
    """Batched unified AFFINE add: p, q = (x, y, inf) with inf a (m, 1)
    mask; returns the sum in the same representation. All lanes share ONE
    field inversion (batch_inverse), so a complete unified add costs ~6-7
    field muls vs ~23 for the branch-free Jacobian add — the engine of the
    MSM merge tree (msm/msm.py). BN254 G1/G2 have odd prime order, so
    y == 0 never occurs off infinity and the doubling denominator 2y is
    safe."""
    F = curve.F
    x1, y1, i1 = p
    x2, y2, i2 = q
    same_x = F.is_zero(F.sub(x2, x1))
    same_y = F.is_zero(F.sub(y2, y1))
    both = jnp.logical_not(jnp.logical_or(i1, i2))
    dbl = jnp.logical_and(same_x, same_y)
    opp = jnp.logical_and(same_x, jnp.logical_not(same_y))  # p == -q

    # denominator: 2y1 on the doubling path, x2 - x1 otherwise; lanes whose
    # true denominator is 0 (infinities, p == -q) get a dummy 1
    d = F.select(dbl, F.add(y1, y1), F.sub(x2, x1))
    bad = jnp.logical_not(jnp.logical_and(both, jnp.logical_not(opp)))
    d = F.select(bad, F.one(F.batch_shape(d)), d)
    dinv = batch_inverse(F, d)

    xx = F.sqr(x1)
    num = F.select(dbl, F.add(F.add(xx, xx), xx), F.sub(y2, y1))
    lam = F.mul(num, dinv)
    x3 = F.sub(F.sub(F.sqr(lam), x1), x2)
    y3 = F.sub(F.mul(lam, F.sub(x1, x3)), y1)

    x3 = F.select(i1, x2, x3)
    y3 = F.select(i1, y2, y3)
    x3 = F.select(i2, x1, x3)
    y3 = F.select(i2, y1, y3)
    inf3 = jnp.logical_or(jnp.logical_and(i1, i2),
                          jnp.logical_and(both, opp))
    return (x3, y3, inf3)


@dataclass
class JacobianCurve:
    F: Any  # field ops module/class
    fused: str = ""  # "g1" -> dispatch big batches to pallas_curve kernels

    # Points are (X, Y, Z) tuples of field elements; Z == 0 encodes infinity.

    def infinity(self, batch_shape=()):
        z = self.F.zeros(batch_shape)
        return (z, z, z)

    def is_infinity(self, p):
        return self.F.is_zero(p[2])

    def select(self, cond, p, q):
        return tuple(self.F.select(cond, a, b) for a, b in zip(p, q))

    def double(self, p):
        if self.fused == "g1":
            from . import pallas_curve
            if pallas_curve.should_use(p):
                return pallas_curve.g1_double(p)
        elif self.fused == "g2":
            from . import pallas_curve_g2
            if pallas_curve_g2.should_use(p):
                return pallas_curve_g2.g2_double(p)
        return self._double_generic(p)

    def _double_generic(self, p):
        X, Y, Z = p
        F = self.F
        A = F.sqr(X)
        B = F.sqr(Y)
        C = F.sqr(B)
        t = F.sqr(F.add(X, B))
        D = F.add(*[F.sub(F.sub(t, A), C)] * 2)          # 2((X+B)^2 - A - C)
        E = F.add(F.add(A, A), A)                        # 3A
        FF = F.sqr(E)
        X3 = F.sub(FF, F.add(D, D))
        C8 = F.add(*[F.add(*[F.add(C, C)] * 2)] * 2)     # 8C
        Y3 = F.sub(F.mul(E, F.sub(D, X3)), C8)
        Z3 = F.mul(F.add(Y, Y), Z)
        return (X3, Y3, Z3)

    def add(self, p, q):
        """Unified complete addition via masked select (branch-free).
        Large same-shape TPU batches dispatch to the fused Pallas kernel
        (pallas_curve.py: one VMEM-resident kernel instead of ~24
        pallas_mont launches)."""
        if self.fused == "g1":
            from . import pallas_curve
            if pallas_curve.should_use(p, q):
                return pallas_curve.g1_add(p, q)
        elif self.fused == "g2":
            from . import pallas_curve_g2
            if pallas_curve_g2.should_use(p, q):
                return pallas_curve_g2.g2_add(p, q)
        return self._add_generic(p, q)

    def _add_generic(self, p, q):
        F = self.F
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        Z1Z1 = F.sqr(Z1)
        Z2Z2 = F.sqr(Z2)
        U1 = F.mul(X1, Z2Z2)
        U2 = F.mul(X2, Z1Z1)
        S1 = F.mul(F.mul(Y1, Z2), Z2Z2)
        S2 = F.mul(F.mul(Y2, Z1), Z1Z1)
        H = F.sub(U2, U1)
        R = F.sub(S2, S1)

        HH = F.sqr(H)
        HHH = F.mul(H, HH)
        V = F.mul(U1, HH)
        X3 = F.sub(F.sub(F.sqr(R), HHH), F.add(V, V))
        Y3 = F.sub(F.mul(R, F.sub(V, X3)), F.mul(S1, HHH))
        Z3 = F.mul(F.mul(Z1, Z2), H)
        added = (X3, Y3, Z3)

        doubled = self.double(p)

        h_zero = F.is_zero(H)
        r_zero = F.is_zero(R)
        p_inf = self.is_infinity(p)
        q_inf = self.is_infinity(q)

        # same x: double if same y, else infinity
        out = self.select(jnp.logical_and(h_zero, r_zero), doubled, added)
        inf = self.infinity(self._bshape(out))
        out = self.select(
            jnp.logical_and(jnp.logical_and(h_zero, jnp.logical_not(r_zero)),
                            jnp.logical_and(jnp.logical_not(p_inf),
                                            jnp.logical_not(q_inf))),
            inf, out)
        out = self.select(p_inf, self._bcast(q, out), out)
        out = self.select(q_inf, self._bcast(p, out), out)
        return out

    def add_nd(self, p, q):
        """Add assuming p != q as non-infinity points (the msm.py scan
        contract: sums of different non-empty subsets of a duplicate-free
        table). On TPU this dispatches to the fused no-double-path kernel;
        the generic fallback is the full (safe) unified add, so non-TPU
        backends are always exact."""
        if self.fused == "g1":
            from . import pallas_curve
            if pallas_curve.should_use(p, q):
                return pallas_curve.g1_add_nd(p, q)
        elif self.fused == "g2":
            from . import pallas_curve_g2
            if pallas_curve_g2.should_use(p, q):
                return pallas_curve_g2.g2_add_nd(p, q)
        return self._add_generic(p, q)

    def madd_z01(self, p, q, distinct: bool = False):
        """Mixed add: p Jacobian + q with Z in {0, 1} EXACTLY (affine or
        infinity — the msm.py chunked-scan step shape). 8M+3S on the add
        path vs 12M+4S for the general add. distinct=True additionally
        drops the double path (see add_nd contract)."""
        if self.fused == "g1":
            from . import pallas_curve
            if pallas_curve.should_use(p, q):
                if distinct:
                    return pallas_curve.g1_madd_nd(p, q)
                return pallas_curve.g1_madd(p, q)
        elif self.fused == "g2":
            from . import pallas_curve_g2
            if pallas_curve_g2.should_use(p, q):
                if distinct:
                    return pallas_curve_g2.g2_madd_nd(p, q)
                return pallas_curve_g2.g2_madd(p, q)
        x2, y2, z2 = q
        return self.mixed_add(p, (x2, y2, self.F.is_zero(z2)))

    def mixed_add(self, p, q_affine):
        """p (Jacobian) + q (affine (x, y) with infinity flag). Cheaper than
        full add: Z2 = 1 eliminates 5 muls. q_inf: (...,1) bool mask."""
        F = self.F
        X1, Y1, Z1 = p
        x2, y2, q_inf = q_affine
        Z1Z1 = F.sqr(Z1)
        U2 = F.mul(x2, Z1Z1)
        S2 = F.mul(F.mul(y2, Z1), Z1Z1)
        H = F.sub(U2, X1)
        R = F.sub(S2, Y1)

        HH = F.sqr(H)
        HHH = F.mul(H, HH)
        V = F.mul(X1, HH)
        X3 = F.sub(F.sub(F.sqr(R), HHH), F.add(V, V))
        Y3 = F.sub(F.mul(R, F.sub(V, X3)), F.mul(Y1, HHH))
        Z3 = F.mul(Z1, H)
        added = (X3, Y3, Z3)

        doubled = self.double(p)
        h_zero = F.is_zero(H)
        r_zero = F.is_zero(R)
        p_inf = self.is_infinity(p)

        out = self.select(jnp.logical_and(h_zero, r_zero), doubled, added)
        inf = self.infinity(self._bshape(out))
        out = self.select(
            jnp.logical_and(jnp.logical_and(h_zero, jnp.logical_not(r_zero)),
                            jnp.logical_not(p_inf)), inf, out)
        # p infinite -> lift q to Jacobian
        q_jac = (x2, y2, self.F.one(self._bshape(out)))
        out = self.select(p_inf, q_jac, out)
        # q infinite -> p
        out = self.select(q_inf, p, out)
        return out

    def add_z01(self, p, q):
        """Unified add when BOTH inputs are affine-or-infinity (Z in {0, 1}
        exactly — the MSM merge tree's leaf level). mmadd-2007-bl shape:
        4M+2S add path + 1M+5S double path vs 12M+4S + 2M+5S generic —
        ~1.9x fewer field muls. Large G1 TPU batches dispatch to the fused
        Pallas kernel."""
        if self.fused == "g1":
            from . import pallas_curve
            if pallas_curve.should_use(p, q):
                return pallas_curve.g1_add_z01(p, q)
        return self._add_z01_generic(p, q)

    def _add_z01_generic(self, p, q):
        F = self.F
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        # Z1 = Z2 = 1 on the non-infinity path: U1=X1, U2=X2, S1=Y1, S2=Y2
        H = F.sub(X2, X1)
        R = F.sub(Y2, Y1)
        HH = F.sqr(H)
        HHH = F.mul(H, HH)
        V = F.mul(X1, HH)
        X3 = F.sub(F.sub(F.sqr(R), HHH), F.add(V, V))
        Y3 = F.sub(F.mul(R, F.sub(V, X3)), F.mul(Y1, HHH))
        added = (X3, Y3, H)                              # Z3 = Z1*Z2*H = H

        # affine double (mdbl: Z = 1): Z3 = 2Y
        A = F.sqr(X1)
        B = F.sqr(Y1)
        C = F.sqr(B)
        t = F.sqr(F.add(X1, B))
        D = F.add(*[F.sub(F.sub(t, A), C)] * 2)
        E = F.add(F.add(A, A), A)
        FF = F.sqr(E)
        dX = F.sub(FF, F.add(D, D))
        C8 = F.add(*[F.add(*[F.add(C, C)] * 2)] * 2)
        dY = F.sub(F.mul(E, F.sub(D, dX)), C8)
        doubled = (dX, dY, F.add(Y1, Y1))

        h_zero = F.is_zero(H)
        r_zero = F.is_zero(R)
        p_inf = self.is_infinity(p)
        q_inf = self.is_infinity(q)

        out = self.select(jnp.logical_and(h_zero, r_zero), doubled, added)
        inf = self.infinity(self._bshape(out))
        out = self.select(
            jnp.logical_and(jnp.logical_and(h_zero, jnp.logical_not(r_zero)),
                            jnp.logical_and(jnp.logical_not(p_inf),
                                            jnp.logical_not(q_inf))),
            inf, out)
        out = self.select(p_inf, self._bcast(q, out), out)
        out = self.select(q_inf, self._bcast(p, out), out)
        return out

    def neg(self, p):
        return (p[0], self.F.neg(p[1]), p[2])

    def scalar_mul_bits(self, p, bits_msb):
        """Batched double-and-add. bits_msb: (..., n_bits) of 0/1 (uint32).
        p: batched Jacobian point."""
        n_bits = bits_msb.shape[-1]
        batch = self._bshape(p)
        acc = self.infinity(batch)

        def body(i, acc):
            acc = self.double(acc)
            bit = jax.lax.dynamic_slice_in_dim(bits_msb, i, 1, axis=-1)
            return self.select(bit != 0, self.add(acc, p), acc)

        return jax.lax.fori_loop(0, n_bits, body, acc)

    # helpers ---------------------------------------------------------------

    def _bshape(self, p):
        return self.F.batch_shape(p[0])

    def _bcast(self, p, like):
        b = self._bshape(like)
        return tuple(self.F.broadcast_to(c, b) for c in p)
