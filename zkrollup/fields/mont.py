"""Batched Montgomery arithmetic over BN254 Fr and Fq for TPU.

Replaces websnark's WASM Montgomery engine (SURVEY §2.4, the target of
/root/reference/operator/src/utils/binarify.ts:78-102 which converts keys to
Montgomery form with R = 2^256) with a lane-parallel JAX implementation:

  - R = 2^(16*16) = 2^256, matching websnark's layout so Montgomery-form
    proving keys interop directly.
  - mont_mul is lazy-carry CIOS: per limb i, accumulate a_i*b and m*N as
    16-bit hi/lo parts into a uint32 accumulator (bounded < 2^22 — see
    analysis in _mont_mul), push only limb-0's carry, shift. One full carry
    propagation at the end. ~512 int32 multiplies per element, all VPU.
  - everything broadcasts over leading batch axes; a (10^6, 16) batch is one
    fused XLA op sequence.

A Pallas kernel variant (fields/pallas_mont.py) fuses these into VMEM-resident
loops for the hash/NTT hot paths.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs as L
from .limbs import (N_LIMBS, LIMB_BITS, MASK, propagate_carries,
                    sub_with_borrow, int_to_limbs)

R_BITS = N_LIMBS * LIMB_BITS  # 256


class FieldCtx:
    """Static per-field constants + batched field ops (Montgomery domain)."""

    def __init__(self, modulus: int, name: str):
        self.p = modulus
        self.name = name
        self.r = 1 << R_BITS
        self.r_mod_p = self.r % modulus
        self.r2 = (self.r * self.r) % modulus
        self.n0inv = (-pow(modulus, -1, 1 << LIMB_BITS)) & 0xFFFF

        self.mod_limbs = jnp.asarray(int_to_limbs(modulus))
        self.r2_limbs = jnp.asarray(int_to_limbs(self.r2))
        self.one_mont = jnp.asarray(int_to_limbs(self.r_mod_p))  # 1 in Mont form
        self.zero = jnp.zeros((N_LIMBS,), jnp.uint32)
        self._n0inv_u32 = jnp.uint32(self.n0inv)

    # -- host-side encode/decode ------------------------------------------

    def to_mont_host(self, xs) -> np.ndarray:
        """list[int] -> (n,16) Montgomery-form limbs, computed on host."""
        return L.ints_to_limbs([(x % self.p) * self.r % self.p for x in xs])

    def from_mont_host(self, a) -> list:
        rinv = pow(self.r, -1, self.p)
        return [v * rinv % self.p for v in L.limbs_to_ints(a)]

    def encode_host(self, xs) -> np.ndarray:
        """Plain ints -> standard-form limbs (no Montgomery)."""
        return L.ints_to_limbs([x % self.p for x in xs])

    def decode_host(self, a) -> list:
        return L.limbs_to_ints(a)

    # -- core ops (jit-safe, batched) -------------------------------------

    def add(self, a, b):
        s = propagate_carries(a + b)
        d, borrow = sub_with_borrow(s, self.mod_limbs)
        return L.select(borrow == 0, d, s)

    def sub(self, a, b):
        d, borrow = sub_with_borrow(a, b)
        d_wrap = propagate_carries(d + self.mod_limbs)
        return L.select(borrow != 0, d_wrap, d)

    def neg(self, a):
        d, _ = sub_with_borrow(self.mod_limbs, a)
        return L.select(L.is_zero(a), a, d)

    def double(self, a):
        return self.add(a, a)

    def mont_mul(self, a, b):
        """Montgomery product abR^-1 mod p. a, b canonical 16-bit limbs.

        Layout note (TPU): computed LIMB-MAJOR — operands are transposed to
        (16, *batch) so the batch axis lands on the 128-wide VPU lanes and
        the 16-limb axis on sublanes. In the natural (*batch, 16) layout the
        last (lane) dim is 16/128 occupied, an 8x waste on every one of the
        ~512 int32 multiplies per element; two transposes amortize over the
        whole CIOS loop. Large same-shape TPU batches dispatch to the fused
        Pallas kernel (pallas_mont.py)."""
        from . import pallas_mont
        if pallas_mont.should_use(a, b):
            return pallas_mont.mont_mul(self, a, b)
        batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
        a = jnp.moveaxis(jnp.broadcast_to(a, batch + (N_LIMBS,)), -1, 0)
        b = jnp.moveaxis(jnp.broadcast_to(b, batch + (N_LIMBS,)), -1, 0)
        n = self.mod_limbs.reshape((N_LIMBS,) + (1,) * len(batch))
        n0 = self._n0inv_u32
        zero_row = jnp.zeros((1,) + batch, jnp.uint32)

        def body(i, t):
            # t += a_i * b  (hi/lo split keeps every add < 2^17 per step;
            # accumulator stays < 16*4*2^16 + carries < 2^23)
            ai = jax.lax.dynamic_slice_in_dim(a, i, 1, axis=0)
            p = ai * b
            t = t.at[:N_LIMBS].add(p & MASK)
            t = t.at[1:N_LIMBS + 1].add(p >> LIMB_BITS)
            # m chosen so limb 0 of (t + m*n) is divisible by 2^16;
            # limb 0's stored low bits are exact (nothing below it carries in)
            m = (t[0:1] * n0) & MASK
            q = m * n
            t = t.at[:N_LIMBS].add(q & MASK)
            t = t.at[1:N_LIMBS + 1].add(q >> LIMB_BITS)
            # push limb 0's (now fully-known) carry and shift down one limb
            t = t.at[1:2].add(t[0:1] >> LIMB_BITS)
            return jnp.concatenate([t[1:], zero_row], axis=0)

        t = jax.lax.fori_loop(
            0, N_LIMBS, body, jnp.zeros((N_LIMBS + 2,) + batch, jnp.uint32))

        # carry-canonicalize (limb-major scan), then one conditional
        # subtraction of p over the 18 limbs (result < 2p)
        def carry_step(c, limb):
            v = limb + c
            return v >> LIMB_BITS, v & MASK

        _, t = jax.lax.scan(carry_step, jnp.zeros_like(t[0]), t)
        ext_n = jnp.concatenate(
            [n, jnp.zeros((2,) + (1,) * len(batch), jnp.uint32)], axis=0)
        ext_n = jnp.broadcast_to(ext_n, t.shape)

        def sub_step(borrow, ab):
            ti, ni = ab
            v = ti - ni - borrow  # uint32 wraparound ok
            return (v >> 31) & 1, v & MASK

        borrow, d = jax.lax.scan(
            sub_step, jnp.zeros_like(t[0]), (t, ext_n))
        out = jnp.where((borrow == 0)[None], d, t)
        return jnp.moveaxis(out[:N_LIMBS], 0, -1)

    def mont_sqr(self, a):
        return self.mont_mul(a, a)

    def to_mont(self, a):
        return self.mont_mul(a, self.r2_limbs)

    def from_mont(self, a):
        one = jnp.zeros((N_LIMBS,), jnp.uint32).at[0].set(1)
        return self.mont_mul(a, one)

    def mont_pow_const(self, a, e: int):
        """a^e (Montgomery domain) for a STATIC exponent e; fori_loop over a
        constant bit array keeps the compiled graph small."""
        n_bits = max(e.bit_length(), 1)
        bits = jnp.asarray([(e >> i) & 1 for i in range(n_bits)], jnp.uint32)
        one = jnp.broadcast_to(self.one_mont, a.shape)

        def body(i, carry):
            acc, base = carry
            bit = bits[i]
            acc = L.select(bit[None], self.mont_mul(acc, base), acc)
            base = self.mont_sqr(base)
            return (acc, base)

        acc, _ = jax.lax.fori_loop(0, n_bits, body, (one, a))
        return acc

    def mont_inv(self, a):
        """a^-1 via Fermat (a^(p-2)); batched."""
        return self.mont_pow_const(a, self.p - 2)

    # convenience -----------------------------------------------------------

    def const_mont(self, x: int) -> jnp.ndarray:
        """Host int -> device constant in Montgomery form, shape (16,)."""
        return jnp.asarray(int_to_limbs(x % self.p * self.r % self.p))


# BN254 scalar field (circuit field; BabyJubJub + MiMC live here)
FR = FieldCtx(
    21888242871839275222246405745257275088548364400416034343698204186575808495617,
    "fr")
# BN254 base field (G1 coordinates)
FQ = FieldCtx(
    21888242871839275222246405745257275088696311157297823662689037894645226208583,
    "fq")
