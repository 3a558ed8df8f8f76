"""Pallas TPU kernel for batched Montgomery multiplication.

The fused-VMEM variant of FieldCtx.mont_mul (mont.py): one grid step pulls a
(16, TILE) limb-major block of each operand into VMEM, runs the full 16-round
CIOS loop + carry canonicalization + conditional subtraction out of registers,
and writes the (16, TILE) product block — no HBM round-trips between rounds
and no dynamic-update-slice traffic. Layout: limbs on sublanes (16), batch on
lanes (TILE multiple of 128), so every int32 multiply uses full VPU width.

This is the TPU-native replacement for websnark's WASM Montgomery engine
(/root/reference/operator/src/utils/binarify.ts:78-102 packs proving keys
into exactly this R=2^256 Montgomery form; SURVEY §2.4 row 1).

On non-TPU backends the kernel runs in interpret mode (tests), and
FieldCtx.mont_mul only dispatches here on TPU for large same-shape batches.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limbs import N_LIMBS, LIMB_BITS, MASK

TILE = 512            # lanes per grid step (multiple of 128)
MIN_BATCH = 1024      # below this the pallas_call overhead dominates
ACC = N_LIMBS + 2     # CIOS accumulator rows


def _make_kernel(n0inv: int):
    n0 = np.uint32(n0inv)

    def kernel(n_ref, a_ref, b_ref, o_ref):
        n_rows = n_ref[:]                 # (16, 1) modulus limbs
        a = a_ref[:]                      # (16, TILE)
        b = b_ref[:]
        w = a.shape[1]
        z1 = jnp.zeros((1, w), jnp.uint32)
        z2 = jnp.zeros((2, w), jnp.uint32)

        def acc(t, v):
            # t += [v & MASK padded to ACC] + [v >> 16 shifted up one row]
            # (concat-padded adds: Pallas TPU has no scatter-add)
            return (t
                    + jnp.concatenate([v & MASK, z2], axis=0)
                    + jnp.concatenate([z1, v >> LIMB_BITS, z1], axis=0))

        t = jnp.zeros((ACC, w), jnp.uint32)
        for i in range(N_LIMBS):          # static unroll: 16 CIOS rounds
            t = acc(t, a[i:i + 1] * b)
            m = (t[0:1] * n0) & MASK
            t = acc(t, m * n_rows)
            # push limb 0's (now exact) carry, then shift down one limb
            carry0 = t[0:1] >> LIMB_BITS
            t = jnp.concatenate([t[1:2] + carry0, t[2:], z1], axis=0)

        # canonicalize carries (t rows < 2^23, so one ripple pass suffices)
        carry = jnp.zeros((a.shape[1],), jnp.uint32)
        rows = []
        for i in range(ACC):
            v = t[i] + carry
            rows.append(v & MASK)
            carry = v >> LIMB_BITS
        t = jnp.stack(rows)

        # conditional subtract p (result < 2p)
        borrow = jnp.zeros((a.shape[1],), jnp.uint32)
        drows = []
        for i in range(ACC):
            ni = n_rows[i, 0] if i < N_LIMBS else np.uint32(0)
            v = t[i] - ni - borrow
            drows.append(v & MASK)
            borrow = (v >> 31) & 1
        d = jnp.stack(drows)
        o_ref[:] = jnp.where((borrow == 0)[None], d, t)[:N_LIMBS]

    return kernel


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _make_butterfly_kernel(n0inv: int):
    """Radix-2 NTT butterfly: (u, b, t) -> (u + b*t, u - b*t), all fused in
    VMEM — one kernel per stage instead of a mul + two scan-based add/subs."""
    n0 = np.uint32(n0inv)

    def kernel(n_ref, u_ref, b_ref, t_ref, s_ref, d_ref):
        n_rows = n_ref[:]
        u = u_ref[:]
        b = b_ref[:]
        t = t_ref[:]
        w = u.shape[1]
        z1 = jnp.zeros((1, w), jnp.uint32)
        z2 = jnp.zeros((2, w), jnp.uint32)

        def acc(acc_t, v):
            return (acc_t
                    + jnp.concatenate([v & MASK, z2], axis=0)
                    + jnp.concatenate([z1, v >> LIMB_BITS, z1], axis=0))

        # v = mont_mul(b, t)
        acc_t = jnp.zeros((ACC, w), jnp.uint32)
        for i in range(N_LIMBS):
            acc_t = acc(acc_t, b[i:i + 1] * t)
            m = (acc_t[0:1] * n0) & MASK
            acc_t = acc(acc_t, m * n_rows)
            carry0 = acc_t[0:1] >> LIMB_BITS
            acc_t = jnp.concatenate(
                [acc_t[1:2] + carry0, acc_t[2:], z1], axis=0)
        carry = jnp.zeros((w,), jnp.uint32)
        rows = []
        for i in range(ACC):
            val = acc_t[i] + carry
            rows.append(val & MASK)
            carry = val >> LIMB_BITS
        acc_t = jnp.stack(rows)
        borrow = jnp.zeros((w,), jnp.uint32)
        drows = []
        for i in range(ACC):
            ni = n_rows[i, 0] if i < N_LIMBS else np.uint32(0)
            val = acc_t[i] - ni - borrow
            drows.append(val & MASK)
            borrow = (val >> 31) & 1
        v = jnp.where((borrow == 0)[None],
                      jnp.stack(drows), acc_t)[:N_LIMBS]

        def add_mod(a_, b_):
            c_ = jnp.zeros((w,), jnp.uint32)
            rr = []
            for i in range(N_LIMBS):
                s_ = a_[i] + b_[i] + c_
                rr.append(s_ & MASK)
                c_ = s_ >> LIMB_BITS
            s_full = jnp.stack(rr)
            bor = jnp.zeros((w,), jnp.uint32)
            dr = []
            for i in range(N_LIMBS):
                val = s_full[i] - n_rows[i, 0] - bor
                dr.append(val & MASK)
                bor = (val >> 31) & 1
            take_d = jnp.logical_or(c_ != 0, bor == 0)
            return jnp.where(take_d[None], jnp.stack(dr), s_full)

        def sub_mod(a_, b_):
            bor = jnp.zeros((w,), jnp.uint32)
            dr = []
            for i in range(N_LIMBS):
                val = a_[i] - b_[i] - bor
                dr.append(val & MASK)
                bor = (val >> 31) & 1
            d_ = jnp.stack(dr)
            c_ = jnp.zeros((w,), jnp.uint32)
            rr = []
            for i in range(N_LIMBS):
                s_ = d_[i] + n_rows[i, 0] + c_
                rr.append(s_ & MASK)
                c_ = s_ >> LIMB_BITS
            return jnp.where((bor != 0)[None], jnp.stack(rr), d_)

        s_ref[:] = add_mod(u, v)
        d_ref[:] = sub_mod(u, v)

    return kernel


@partial(jax.jit, static_argnames=("field",))
def butterfly(field, u: jnp.ndarray, b: jnp.ndarray, t: jnp.ndarray):
    """u, b, t: (n, 16) canonical limbs -> (u + b*t, u - b*t) mod p, both
    (n, 16). The NTT hot op, one fused kernel per stage."""
    n = u.shape[0]
    n_pad = -(-n // TILE) * TILE
    ins = []
    for c in (u, b, t):
        if n_pad != n:
            c = jnp.pad(c, ((0, n_pad - n), (0, 0)))
        ins.append(jnp.moveaxis(c, -1, 0))
    kernel = _make_butterfly_kernel(field.n0inv)
    spec = pl.BlockSpec((N_LIMBS, TILE), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    n_spec = pl.BlockSpec((N_LIMBS, 1), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    s_out, d_out = pl.pallas_call(
        kernel,
        grid=(n_pad // TILE,),
        in_specs=[n_spec] + [spec] * 3,
        out_specs=[spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((N_LIMBS, n_pad), jnp.uint32)] * 2,
        interpret=_interpret(),
    )(field.mod_limbs.reshape(N_LIMBS, 1), *ins)
    unpack = lambda o: jnp.moveaxis(o, 0, -1)[:n]
    return unpack(s_out), unpack(d_out)


def butterfly_should_use(n: int) -> bool:
    if _ENV == "0":
        return False
    if jax.default_backend() != "tpu":
        return False
    return n >= MIN_BATCH


@partial(jax.jit, static_argnames=("field",))
def mont_mul(field, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a, b: (..., 16) canonical limbs, SAME shape -> (..., 16) mont product."""
    shape = a.shape
    a2 = a.reshape(-1, N_LIMBS)
    b2 = b.reshape(-1, N_LIMBS)
    n = a2.shape[0]
    n_pad = -(-n // TILE) * TILE
    if n_pad != n:
        pad = ((0, n_pad - n), (0, 0))
        a2 = jnp.pad(a2, pad)
        b2 = jnp.pad(b2, pad)
    at = jnp.moveaxis(a2, -1, 0)          # (16, n_pad) limb-major
    bt = jnp.moveaxis(b2, -1, 0)

    kernel = _make_kernel(field.n0inv)
    n_in = field.mod_limbs.reshape(N_LIMBS, 1)
    spec = pl.BlockSpec((N_LIMBS, TILE), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    n_spec = pl.BlockSpec((N_LIMBS, 1), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // TILE,),
        in_specs=[n_spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((N_LIMBS, n_pad), jnp.uint32),
        interpret=_interpret(),
    )(n_in, at, bt)
    return jnp.moveaxis(out, 0, -1)[:n].reshape(shape)


_ENV = os.environ.get("ZKROLLUP_PALLAS", "auto")


def should_use(a, b) -> bool:
    """Dispatch gate used by FieldCtx.mont_mul: TPU backend, same static
    shape, batch big enough to amortize the pallas_call."""
    if _ENV == "0":
        return False
    if _ENV == "auto" and jax.default_backend() != "tpu":
        return False
    if a.ndim < 2 or a.shape != b.shape:
        return False
    batch = 1
    for d in a.shape[:-1]:
        batch *= d
    return batch >= MIN_BATCH
