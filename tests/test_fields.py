"""Differential tests: JAX limb/Montgomery field ops vs Python-int ground truth.

SURVEY §7.2 step 1 — the limb layout and CIOS reduction everything else
builds on. Edge cases: 0, 1, p-1, p-2, values straddling conditional-subtract
boundaries.
"""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zkrollup.fields import limbs as L
from zkrollup.fields.mont import FR, FQ

random.seed(42)


def rand_elems(F, n):
    return [random.randrange(F.p) for _ in range(n)]


EDGE = lambda F: [0, 1, 2, F.p - 1, F.p - 2, (F.p - 1) // 2, 1 << 255 & (F.p - 1)]


class TestLimbs:
    def test_roundtrip(self):
        xs = [0, 1, (1 << 256) - 1, 0xDEADBEEF << 128]
        a = L.ints_to_limbs(xs)
        assert L.limbs_to_ints(a) == xs

    def test_propagate_carries(self):
        # max in-contract limb value: 2^32 - 2^16 (headroom for carry-in)
        t = jnp.asarray(np.full((3, 16), 0xFFFF_0000, np.uint32))
        out = np.asarray(L.propagate_carries(t))
        assert (out < (1 << 16)).all()
        # value mod 2^256 preserved
        want = sum(0xFFFF_0000 << (16 * i) for i in range(16)) % (1 << 256)
        assert L.limbs_to_ints(out)[0] == want

    def test_sub_with_borrow(self):
        a = jnp.asarray(L.ints_to_limbs([100, 5]))
        b = jnp.asarray(L.ints_to_limbs([60, 9]))
        d, borrow = L.sub_with_borrow(a, b)
        assert L.limbs_to_ints(np.asarray(d))[0] == 40
        assert int(borrow[0, 0]) == 0 and int(borrow[1, 0]) == 1

    def test_bits_msb_first(self):
        a = jnp.asarray(L.ints_to_limbs([0b1011]))
        bits = np.asarray(L.bits_msb_first(a, 8))[0]
        assert list(bits) == [0, 0, 0, 0, 1, 0, 1, 1]


@pytest.mark.slow  # compile-heavy: jits the 16-round CIOS graphs per field
@pytest.mark.parametrize("F", [FR, FQ], ids=["fr", "fq"])
class TestMontField:
    def test_mont_mul(self, F):
        xs = rand_elems(F, 32) + EDGE(F)
        ys = rand_elems(F, 32) + list(reversed(EDGE(F)))
        a = jnp.asarray(F.to_mont_host(xs))
        b = jnp.asarray(F.to_mont_host(ys))
        got = F.from_mont_host(np.asarray(jax.jit(F.mont_mul)(a, b)))
        assert got == [(x * y) % F.p for x, y in zip(xs, ys)]

    def test_add_sub_neg(self, F):
        xs = rand_elems(F, 16) + EDGE(F)
        ys = rand_elems(F, 16) + EDGE(F)
        a = jnp.asarray(F.encode_host(xs))
        b = jnp.asarray(F.encode_host(ys))
        assert F.decode_host(np.asarray(F.add(a, b))) == [
            (x + y) % F.p for x, y in zip(xs, ys)]
        assert F.decode_host(np.asarray(F.sub(a, b))) == [
            (x - y) % F.p for x, y in zip(xs, ys)]
        assert F.decode_host(np.asarray(F.neg(a))) == [(-x) % F.p for x in xs]

    def test_mont_roundtrip_on_device(self, F):
        xs = rand_elems(F, 8) + EDGE(F)
        enc = jnp.asarray(F.encode_host(xs))
        back = F.decode_host(np.asarray(F.from_mont(F.to_mont(enc))))
        assert back == xs

    def test_inverse(self, F):
        xs = rand_elems(F, 6) + [1, F.p - 1]
        a = jnp.asarray(F.to_mont_host(xs))
        inv = jax.jit(F.mont_inv)(a)
        prod = F.from_mont_host(np.asarray(F.mont_mul(a, inv)))
        assert prod == [1] * len(xs)

    def test_pow_const(self, F):
        xs = rand_elems(F, 4)
        a = jnp.asarray(F.to_mont_host(xs))
        e = 65537
        got = F.from_mont_host(np.asarray(F.mont_pow_const(a, e)))
        assert got == [pow(x, e, F.p) for x in xs]

    def test_broadcasting(self, F):
        xs = rand_elems(F, 5)
        a = jnp.asarray(F.to_mont_host(xs))
        one = F.one_mont  # shape (16,), broadcasts against (5,16)
        got = F.from_mont_host(np.asarray(F.mont_mul(a, one)))
        assert got == xs
