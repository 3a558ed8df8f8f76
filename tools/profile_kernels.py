"""Raw kernel throughput on the real TPU: mont_mul, fused g1_add, sliced
g1_add (the merge-tree access pattern), scatter, gather. Establishes the
speed-of-light for the MSM bucket phase."""
import os
import sys
import time
import random

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

from zkrollup.ref import bn254 as ref
from zkrollup.curve import g1_jax, pallas_curve
from zkrollup.fields import limbs as L
from zkrollup.fields.mont import FQ
from zkrollup.fields import pallas_mont

LOG_N = int(os.environ.get("P_LOG_N", "20"))


def timeit(name, fn, reps=5):
    t0 = time.time()
    jax.block_until_ready(fn())
    compile_t = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        jax.block_until_ready(fn())
    dt = (time.time() - t0) / reps
    print(f"{name:44s} compile {compile_t:6.1f}s  steady {dt*1000:9.2f}ms",
          flush=True)
    return dt


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/zkrollup/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    print("devices:", jax.devices(), flush=True)
    random.seed(7)
    n = 1 << LOG_N

    base = [ref.g1_mul(ref.G1_GEN, random.randrange(1, ref.R))
            for _ in range(32)]
    x, y, _ = g1_jax.pack_affine_host(base * (n // 32))
    one_z = np.broadcast_to(np.asarray(FQ.one_mont), (n, L.N_LIMBS))
    P = (jnp.asarray(x), jnp.asarray(y), jnp.asarray(one_z.copy()))
    Q = (jnp.asarray(np.roll(x, 1, 0)), jnp.asarray(np.roll(y, 1, 0)),
         jnp.asarray(one_z.copy()))

    dt = timeit(f"mont_mul 2^{LOG_N}",
                jax.jit(lambda: pallas_mont.mont_mul(FQ, P[0], Q[0])))
    print(f"  -> {n/dt/1e6:.1f} M mul/s", flush=True)

    dt = timeit(f"fused g1_add 2^{LOG_N}",
                jax.jit(lambda: pallas_curve.g1_add(P, Q)))
    print(f"  -> {n/dt/1e6:.2f} M add/s  ({n*34/dt/1e6:.0f} M mul-equiv/s)",
          flush=True)

    # the merge-tree level-0 pattern: strided slice + add + selects
    @jax.jit
    def level0():
        a = jax.tree_util.tree_map(lambda t: t[0::2], P)
        b = jax.tree_util.tree_map(lambda t: t[1::2], P)
        br = pallas_curve.g1_add(a, b)
        m = (jnp.arange(n // 2, dtype=jnp.uint32) & 1)[:, None]
        lv = g1_jax.G1.select(m, br, a)
        rv = g1_jax.G1.select(m, br, b)
        return lv, rv
    dt = timeit(f"tree level0 (slice+add+2select) 2^{LOG_N-1}", level0)
    print(f"  -> {(n/2)/dt/1e6:.2f} M add/s incl overhead", flush=True)

    # gather 3 coords by random index
    idx = jnp.asarray(np.random.RandomState(0).permutation(n).astype(np.int32))
    timeit(f"gather x,y,z by perm 2^{LOG_N}",
           jax.jit(lambda: jax.tree_util.tree_map(
               lambda t: jnp.take(t, idx, axis=0), P)))

    # scatter-set n -> 16k buckets (one level's banking)
    bidx = jnp.asarray((np.random.RandomState(1).randint(0, 1 << 14, size=n))
                       .astype(np.uint32))
    timeit(f"scatter-set 3 coords 2^{LOG_N} -> 2^14",
           jax.jit(lambda: jax.tree_util.tree_map(
               lambda t: jnp.zeros((1 << 14, L.N_LIMBS), jnp.uint32)
               .at[bidx].set(t, mode="drop"), P)))

    # batched row sort (13, n/8) + iota payload
    W = 13
    dg = jnp.asarray(np.random.RandomState(2)
                     .randint(0, 1024, size=(W, n // 8)).astype(np.uint32))
    iota = jnp.broadcast_to(jnp.arange(n // 8, dtype=jnp.int32)[None],
                            (W, n // 8))
    timeit(f"lax.sort (13, 2^{LOG_N-3}) + payload",
           jax.jit(lambda: jax.lax.sort((dg, iota), dimension=1,
                                        num_keys=1)))


if __name__ == "__main__":
    main()
