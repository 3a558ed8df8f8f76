"""Breakdown profiler for the TPU MSM (run on the real chip).

Times each stage of the scan-path MSM (msm/msm.py, ZKROLLUP_MSM_TREE=scan
default) separately:
  (b) digit extraction
  (c) batched row-sort + flat gather (no curve math)
  (d) full window sums (sort + suffix scan + boundary gather + reduce)
  (e) on-device Horner combine (full msm minus (d))
  (f) full msm

Env: P_LOG_N (default 17), P_C (default 12), ZKROLLUP_MSM_TREE to profile
the legacy run-merge variants instead.
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
from zkrollup.msm import msm as M

LOG_N = int(os.environ.get("P_LOG_N", "17"))
C = int(os.environ.get("P_C", "12"))


def timeit(name, fn, reps=3):
    t0 = time.time()
    jax.block_until_ready(fn())
    compile_t = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        jax.block_until_ready(fn())
    dt = (time.time() - t0) / reps
    print(f"{name:44s} compile {compile_t:7.1f}s  steady {dt*1000:9.1f}ms",
          flush=True)
    return dt


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/zkrollup/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    print(f"devices: {jax.devices()}  mode={M._TREE_MODE} c={C}", flush=True)
    random.seed(1234)
    n = 1 << LOG_N
    base = [ref.g1_mul(ref.G1_GEN, random.randrange(1, ref.R))
            for _ in range(64)]
    pts = base * (n // 64)
    x, y, inf = g1_jax.pack_affine_host(pts)
    pa = (jnp.asarray(x), jnp.asarray(y), jnp.asarray(inf))
    scalars = [random.randrange(ref.R) for _ in range(n)]
    sc = jnp.asarray(L.ints_to_limbs(scalars))
    n_windows = (256 + C - 1) // C
    curve = g1_jax.G1

    digits_fn = jax.jit(partial(M.window_digits, c=C, n_windows=n_windows))
    timeit("(b) window_digits", lambda: digits_fn(sc))
    digits = jax.block_until_ready(digits_fn(sc))
    W, _ = digits.shape

    @jax.jit
    def sort_gather(dg):
        iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None],
                                (W, n))
        d_sorted, perm = jax.lax.sort((dg, iota), dimension=1, num_keys=1)
        idx = perm.reshape(-1)
        return (d_sorted, jnp.take(pa[0], idx, axis=0),
                jnp.take(pa[1], idx, axis=0), jnp.take(pa[2], idx, axis=0))
    timeit("(c) batched sort + flat gather", lambda: sort_gather(digits))

    @jax.jit
    def window_sums_only(dg):
        return M._flat_window_sums(curve, dg, (pa[0], pa[1]), pa[2], C)
    timeit("(d) window sums (sort+scan+gather+reduce)",
           lambda: window_sums_only(digits))

    full = jax.jit(partial(M.msm, curve, c=C))
    d_f = timeit("(f) full msm", lambda: full(pa, sc))
    print(f"-> {n / d_f:,.0f} points/s", flush=True)


if __name__ == "__main__":
    main()
