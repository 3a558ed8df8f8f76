"""Profiler for the chunked-scan MSM (msm.py mode "scan", round 5).

Measures, on the real chip, with DISTINCT points (native fixed-base
generator, cached npz — VERDICT r4 weak #6):
  (a) single-table window_sums + host combine (the bench metric path)
  (b) the fused 4-table prove-shaped MSM (msm_multi_host_combine)

Env: P_LOG_N (default 17), P_C (default 12), P_CHUNK (default 64),
P_DISTINCT (default 1), P_MULTI=0 to skip the fused run.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

if os.environ.get("P_CHUNK"):
    os.environ["ZKROLLUP_MSM_CHUNK"] = os.environ["P_CHUNK"]

import jax
import jax.numpy as jnp
import numpy as np

from zkrollup.ref import bn254 as ref
from zkrollup.curve import g1_jax
from zkrollup.fields import limbs as L
from zkrollup.msm import msm as M

LOG_N = int(os.environ.get("P_LOG_N", "17"))
C = int(os.environ.get("P_C", "12"))
DISTINCT = os.environ.get("P_DISTINCT", "1") == "1"
def distinct_points(n, tag):
    """n DISTINCT affine points (mont limbs) via the native fixed-base
    engine; cached to disk (the real proving-key-table distribution class,
    not 64 points tiled)."""
    cache = os.path.expanduser(f"~/.cache/zkrollup/msm_points_{tag}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        if z["x"].shape[0] >= n:
            return z["x"][:n], z["y"][:n], z["inf"][:n]
    from zkrollup.native import engine
    rng = np.random.RandomState(42)
    # distinct scalars -> distinct points (fixed-base, injective below r)
    sc_vals = rng.randint(1, 1 << 62, size=2 * n).astype(np.uint64)
    sc_vals = np.unique(sc_vals)[:n]
    assert sc_vals.shape[0] == n
    sc = b"".join(int(v).to_bytes(32, "little") for v in sc_vals)
    t0 = time.time()
    x, y, inf = engine.g1_fixed_base_mont(sc, n)
    print(f"generated {n} distinct points in {time.time()-t0:.1f}s")
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    np.savez(cache, x=x, y=y, inf=inf)
    return x, y, inf


def timeit(name, fn, reps=3):
    t0 = time.time()
    jax.block_until_ready(fn())
    compile_t = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        jax.block_until_ready(fn())
    dt = (time.time() - t0) / reps
    print(f"{name:46s} compile {compile_t:7.1f}s  steady {dt*1000:9.1f}ms",
          flush=True)
    return dt


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/zkrollup/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    n = 1 << LOG_N
    print(f"devices: {jax.devices()} mode={M._TREE_MODE} c={C} "
          f"chunk={M.CHUNK} distinct={DISTINCT}", flush=True)
    x, y, inf = distinct_points(n, str(LOG_N))
    pa = (jnp.asarray(x), jnp.asarray(y), jnp.asarray(inf))
    rng = np.random.RandomState(1234)
    sc_np = np.zeros((n, L.N_LIMBS), np.uint32)
    for i in range(L.N_LIMBS):
        sc_np[:, i] = rng.randint(0, 1 << 16, size=n).astype(np.uint32)
    # keep scalars < r by clearing the top limb's high bits
    sc_np[:, 15] &= 0x2FFF
    sc = jnp.asarray(sc_np)

    d = timeit("(a) window_sums+host combine (single 2^%d)" % LOG_N,
               lambda: M.msm_host_combine(g1_jax.G1, pa, sc, c=C,
                                          distinct=DISTINCT))
    print(f"-> {n / d:,.0f} points/s", flush=True)

    if os.environ.get("P_MULTI", "1") == "1":
        # prove-shaped: 4 tables sized like BatchProcessTx(2,6)
        sizes = [111000, 75000, 117000, 131071]
        total = sum(sizes)
        xs, ys, infs = distinct_points(total, "prove4")
        tbls = []
        s0 = 0
        for szt in sizes:
            tbls.append((xs[s0:s0 + szt], ys[s0:s0 + szt],
                         infs[s0:s0 + szt]))
            s0 += szt
        packed, bounds = M.pack_tables(tbls)
        N = packed[0].shape[0]
        sc_cat = np.zeros((N, L.N_LIMBS), np.uint32)
        for i in range(L.N_LIMBS):
            sc_cat[:, i] = rng.randint(0, 1 << 16, size=N).astype(np.uint32)
        sc_cat[:, 15] &= 0x2FFF
        sc_cat[total:] = 0
        scj = jnp.asarray(sc_cat)
        d = timeit(f"(b) fused 4-table ({total} pts, prove shape)",
                   lambda: M.msm_multi_host_combine(
                       g1_jax.G1, packed, bounds, scj, c=C,
                       distinct=DISTINCT))
        print(f"-> {total / d:,.0f} points/s fused", flush=True)


if __name__ == "__main__":
    main()
