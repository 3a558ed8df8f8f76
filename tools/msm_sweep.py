"""Sweep MSM (window c, scan chunk K) on the real chip.

Usage: python tools/msm_sweep.py <c> <chunk> [log_n]
Prints one line: c chunk log_n compile_s steady_s pts_per_s

Run per-config in a subprocess: ZKROLLUP_MSM_CHUNK is bound at
zkrollup.msm.msm import time.
"""
import os
import sys
import time

c = int(sys.argv[1])
chunk = int(sys.argv[2])
log_n = int(sys.argv[3]) if len(sys.argv) > 3 else 17
os.environ["ZKROLLUP_MSM_CHUNK"] = str(chunk)

import random

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402  (reuse the cached distinct-point fixture)
from zkrollup.curve import g1_jax  # noqa: E402
from zkrollup.fields import limbs as L  # noqa: E402
from zkrollup.msm.msm import msm_host_combine  # noqa: E402
from zkrollup.ref import bn254 as ref  # noqa: E402

random.seed(1234)
n = 1 << log_n
x, y, inf = bench._distinct_points(n, str(log_n))
pa = (jnp.asarray(x), jnp.asarray(y), jnp.asarray(inf))
scalars = [random.randrange(ref.R) for _ in range(n)]
sc = jnp.asarray(L.ints_to_limbs(scalars))


def run():
    import jax
    return jax.block_until_ready(
        msm_host_combine(g1_jax.G1, pa, sc, c=c, distinct=True))


t0 = time.time()
r1 = run()
compile_s = time.time() - t0
t0 = time.time()
r2 = run()
steady = time.time() - t0
print(f"c={c} chunk={chunk} log_n={log_n} compile={compile_s:.1f}s "
      f"steady={steady:.3f}s pts/s={n / steady:,.0f}", flush=True)
