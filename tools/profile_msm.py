"""Breakdown profiler for the TPU MSM (run on the real chip).

Times each stage of msm/msm.py separately:
  (a) GLV host decomposition (limb fast path)
  (b) digit extraction
  (c) batched row-sort + flat gather (no curve math)
  (d) flat window sums (sort + merge tree + bucket scans)
  (e) host window combine
  (f) full msm_glv (everything)
"""
import os
import sys
import time
import random
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

from zkrollup.ref import bn254 as ref
from zkrollup.curve import g1_jax
from zkrollup.fields import limbs as L
from zkrollup.fields.mont import FQ
from zkrollup.msm import msm as M
from zkrollup.msm import glv

LOG_N = int(os.environ.get("P_LOG_N", "17"))
C = int(os.environ.get("P_C", "10"))


def timeit(name, fn, reps=3):
    t0 = time.time()
    jax.block_until_ready(fn())
    compile_t = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        jax.block_until_ready(fn())
    dt = (time.time() - t0) / reps
    print(f"{name:40s} compile {compile_t:7.1f}s  steady {dt*1000:9.1f}ms",
          flush=True)
    return dt


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/zkrollup/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    print("devices:", jax.devices(), flush=True)
    random.seed(1234)
    n = 1 << LOG_N
    base = [ref.g1_mul(ref.G1_GEN, random.randrange(1, ref.R))
            for _ in range(64)]
    pts = base * (n // 64)
    x, y, inf = g1_jax.pack_affine_host(pts)
    pa = (jnp.asarray(x), jnp.asarray(y), jnp.asarray(inf))
    scalars = [random.randrange(ref.R) for _ in range(n)]
    sc_limbs = L.ints_to_limbs(scalars)

    # (a) host GLV decomposition (limb path)
    t0 = time.time()
    for _ in range(3):
        abs_limbs, neg = glv.decompose_batch(sc_limbs)
    print(f"{'(a) glv host decompose (limbs)':40s} {'':18s} "
          f"steady {(time.time()-t0)/3*1000:9.1f}ms", flush=True)

    abs_d = jnp.asarray(abs_limbs)
    neg_d = jnp.asarray(neg)
    n_windows = (glv.GLV_BITS + C - 1) // C
    curve = g1_jax.G1

    @jax.jit
    def build_pts():
        x0, y0, i0 = pa
        x2 = jnp.concatenate([x0, FQ.mont_mul(x0, glv._beta_mont())], axis=0)
        y2 = jnp.concatenate([y0, y0], axis=0)
        i2 = jnp.concatenate([i0, i0], axis=0)
        y2 = L.select(neg_d, FQ.neg(y2), y2)
        return x2, y2, i2
    x2, y2, i2 = jax.block_until_ready(build_pts())

    digits_fn = jax.jit(partial(M.window_digits, c=C, n_windows=n_windows))
    timeit("(b) window_digits", lambda: digits_fn(abs_d))
    digits = jax.block_until_ready(digits_fn(abs_d))
    W, n2 = digits.shape

    @jax.jit
    def sort_gather(dg):
        iota = jnp.broadcast_to(jnp.arange(n2, dtype=jnp.int32)[None],
                                (W, n2))
        d_sorted, perm = jax.lax.sort((dg, iota), dimension=1, num_keys=1)
        idx = perm.reshape(-1)
        return (d_sorted,
                jnp.take(x2, idx, axis=0), jnp.take(y2, idx, axis=0),
                jnp.take(i2, idx, axis=0))
    timeit("(c) batched sort + flat gather", lambda: sort_gather(digits))

    @jax.jit
    def flat_sums(dg):
        return M._flat_window_sums(curve, dg, (x2, y2), i2, C)
    timeit("(d) flat window sums", lambda: flat_sums(dg=digits))
    wsum = jax.block_until_ready(flat_sums(digits))

    t0 = time.time()
    for _ in range(3):
        glv.combine_window_sums_host(wsum, C)
    print(f"{'(e) host window combine':40s} {'':18s} "
          f"steady {(time.time()-t0)/3*1000:9.1f}ms", flush=True)

    timeit("(f) full msm_glv", lambda: glv.msm_glv(pa, sc_limbs, c=C))


if __name__ == "__main__":
    main()
