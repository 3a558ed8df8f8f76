"""Multi-limb big-integer layout + primitive ops for TPU field arithmetic.

Design (SURVEY §7.3 "256-bit modular mul on TPU"): a 254-bit field element is
16 little-endian limbs of 16 bits, stored as uint32 along the LAST axis so
every op vectorizes over arbitrary leading batch axes on the VPU (8x128
lanes). 16-bit limbs keep every partial product exact in uint32
(0xffff^2 < 2^32) and leave 16 bits of headroom for lazy-carry accumulation —
no 64-bit integers anywhere (TPU has none).

This replaces the websnark WASM bigint engine the reference leans on
(/root/reference/operator/src/utils/binarify.ts packs keys for it; see
SURVEY §2.4) with a batched, XLA-fusable representation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N_LIMBS = 16
LIMB_BITS = 16
MASK = np.uint32(0xFFFF)


# ---------------------------------------------------------------------------
# Host <-> device packing
# ---------------------------------------------------------------------------

def int_to_limbs(x: int) -> np.ndarray:
    """Python int -> (16,) uint32 limb vector (little-endian 16-bit limbs)."""
    return np.array([(x >> (LIMB_BITS * i)) & 0xFFFF for i in range(N_LIMBS)],
                    dtype=np.uint32)


def ints_to_limbs(xs) -> np.ndarray:
    """Iterable of ints -> (n, 16) uint32. One C-speed int.to_bytes per
    element + a vectorized uint16 widen: ~250x the per-limb Python shift
    loop (15s -> 60ms for the 117k-element (2,6) witness)."""
    xs = list(xs)
    mask = (1 << 256) - 1   # old per-limb path truncated beyond 2^256 too
    raw = b"".join((x & mask).to_bytes(32, "little") for x in xs)
    return np.frombuffer(raw, dtype="<u2").reshape(
        len(xs), N_LIMBS).astype(np.uint32)


def limbs_to_int(a) -> int:
    """(..., 16) -> python int (single element)."""
    a = np.asarray(a, dtype=np.uint64).reshape(-1, N_LIMBS)
    assert a.shape[0] == 1, "use limbs_to_ints for batches"
    return limbs_to_ints(a)[0]


def limbs_to_ints(a) -> list:
    a = np.asarray(a, dtype=np.uint64)
    flat = a.reshape(-1, N_LIMBS)
    if flat.size and flat.max() <= 0xFFFF:
        # canonical limbs: one C-speed int.from_bytes per row
        raw = np.ascontiguousarray(flat.astype("<u2")).tobytes()
        return [int.from_bytes(raw[i * 32:(i + 1) * 32], "little")
                for i in range(flat.shape[0])]
    out = []
    for row in flat:
        v = 0
        for i in range(N_LIMBS - 1, -1, -1):
            v = (v << LIMB_BITS) | int(row[i])
        out.append(v)
    return out


# ---------------------------------------------------------------------------
# Carry / borrow propagation (sequential over the 16-limb axis, vector over
# batch). lax.scan keeps the graph small; 16 steps of VPU work.
# ---------------------------------------------------------------------------

def propagate_carries(t: jnp.ndarray) -> jnp.ndarray:
    """Canonicalize limbs: each output limb < 2^16, carries rippled up.
    Contract: input limb + incoming carry must fit in uint32, i.e. limbs
    <= 2^32 - 2^16 is always safe. Final carry out is dropped (caller
    guarantees the value fits the limb count)."""
    tm = jnp.moveaxis(t, -1, 0)  # (L, ...)

    def step(carry, limb):
        v = limb + carry
        return v >> LIMB_BITS, v & MASK

    _, out = jax.lax.scan(step, jnp.zeros_like(tm[0]), tm)
    return jnp.moveaxis(out, 0, -1)


def sub_with_borrow(a: jnp.ndarray, b: jnp.ndarray):
    """a - b limbwise; returns (diff limbs canonical, borrow_out (...,1) 0/1).
    a, b canonical 16-bit limbs."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    am = jnp.moveaxis(jnp.broadcast_to(a, shape), -1, 0)
    bm = jnp.moveaxis(jnp.broadcast_to(b, shape), -1, 0)

    def step(borrow, ab):
        ai, bi = ab
        v = ai - bi - borrow  # uint32 wraparound ok
        out = v & MASK
        borrow_next = (v >> 31) & 1  # negative iff high bit set after wrap
        return borrow_next, out

    borrow, out = jax.lax.scan(step, jnp.zeros_like(am[0]), (am, bm))
    return jnp.moveaxis(out, 0, -1), borrow[..., None]


def add_limbs(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) canonicalized; no reduction. Caller ensures < 2^256."""
    return propagate_carries(a + b)


def geq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a >= b as (...,1) bool, canonical limbs."""
    _, borrow = sub_with_borrow(a, b)
    return borrow == 0


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1, keepdims=True)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1, keepdims=True)


def select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """cond: (...,1) bool/int — where(cond, a, b) limbwise."""
    return jnp.where(cond != 0, a, b)


def bits_msb_first(a: jnp.ndarray, n_bits: int = 256) -> jnp.ndarray:
    """(..., 16) limbs -> (..., n_bits) of 0/1, most significant bit first."""
    shifts = jnp.arange(LIMB_BITS, dtype=jnp.uint32)
    # (..., 16, 16): bit j of limb i
    b = (a[..., :, None] >> shifts) & 1
    le = b.reshape(a.shape[:-1] + (N_LIMBS * LIMB_BITS,))  # lsb-first
    return jnp.flip(le, axis=-1)[..., (N_LIMBS * LIMB_BITS - n_bits):]
