"""Headline benchmark — run on real TPU by the driver.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Round-1 headline: BN254 G1 MSM throughput at 2^17 points (BASELINE.json
config 3 — websnark's multiexp is the reference's hottest kernel). The
reference publishes no numbers (BASELINE.md), so vs_baseline is measured
against a fixed websnark-class CPU proxy:

  BASELINE_MSM_POINTS_PER_S = 20_000
    websnark WASM multiexp on a dev-class CPU core: tornado/semaphore-era
    proofs over ~2^16-2^17-point tables took ~5-15 s in the browser/node,
    i.e. O(10-20k) effective points/s; the reference's own 60 s jest
    timeout for single proofs (prover/package.json:41) brackets the same
    order of magnitude.

Extra stage timings are printed to stderr for humans.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MSM_POINTS_PER_S = 20_000.0
LOG_N = int(os.environ.get("BENCH_MSM_LOG_N", "17"))
MSM_WINDOW = int(os.environ.get("BENCH_MSM_WINDOW", "10"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import random
    import numpy as np
    import jax
    import jax.numpy as jnp
    from functools import partial

    from zkrollup.ref import bn254 as ref
    from zkrollup.curve import g1_jax
    from zkrollup.fields import limbs as L
    from zkrollup.msm.msm import msm
    from zkrollup.msm import glv

    if jax.default_backend() not in ("cpu",):
        # persistent compile cache: the MSM graph takes ~2-3 min to compile
        # on a fresh process; cached reruns skip it. (Not on CPU: serializing
        # the big CPU executables segfaults this jaxlib — see tests/conftest.)
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/zkrollup/jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    log(f"devices: {jax.devices()}")
    random.seed(1234)
    n = 1 << LOG_N
    use_glv = os.environ.get("BENCH_GLV", "1") != "0"

    # distinct base points via tiling host points (coordinates irrelevant
    # to throughput); scalars uniform in Fr
    base = [ref.g1_mul(ref.G1_GEN, random.randrange(1, ref.R))
            for _ in range(64)]
    pts = base * (n // 64)
    x, y, inf = g1_jax.pack_affine_host(pts)
    pa = (jnp.asarray(x), jnp.asarray(y), jnp.asarray(inf))
    scalars = [random.randrange(ref.R) for _ in range(n)]

    if use_glv:
        # the production prover path (groth16/prove.py): GLV halves the
        # window count; host decomposition + host window combine are
        # counted in the timing (limb-form scalars, as prove.py passes)
        sc_limbs = L.ints_to_limbs(scalars)

        def run():
            return glv.msm_glv(pa, sc_limbs, c=MSM_WINDOW)
        variant = f"GLV, window c={MSM_WINDOW}"
    else:
        sc = jnp.asarray(L.ints_to_limbs(scalars))
        f = jax.jit(partial(msm, g1_jax.G1, c=MSM_WINDOW))

        def run():
            return f(pa, sc)
        variant = f"window c={MSM_WINDOW}"

    t0 = time.time()
    jax.block_until_ready(run())
    log(f"compile+first run: {time.time() - t0:.1f}s")

    reps = 3
    t0 = time.time()
    for _ in range(reps):
        jax.block_until_ready(run())
    dt = (time.time() - t0) / reps
    pts_per_s = n / dt
    log(f"steady: {dt:.2f}s per 2^{LOG_N} MSM -> {pts_per_s:,.0f} points/s")

    print(json.dumps({
        "metric": "bn254_g1_msm_points_per_s",
        "value": round(pts_per_s, 1),
        "unit": f"points/s (2^{LOG_N} MSM, {variant}, 1 chip)",
        "vs_baseline": round(pts_per_s / BASELINE_MSM_POINTS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
