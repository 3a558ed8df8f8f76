"""Probe raw VPU primitive throughput inside Pallas on the real TPU:
uint32 multiply vs add vs f32 multiply, and the CIOS round mix.
Pins down why mont_mul runs at ~40M/s (expected ~10x more)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG_N = int(os.environ.get("P_LOG_N", "19"))
TILE = 512
ROWS = 16
REPS_IN_KERNEL = 16   # do the op 16x per block to amortize memory traffic


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


def make(op):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        acc = jnp.zeros_like(a)
        for _ in range(REPS_IN_KERNEL):
            acc = acc ^ op(a, b)
            a = a ^ acc  # serialize: prevent CSE across reps
        o_ref[:] = acc
    return kernel


def run(name, op, n):
    a = jnp.asarray(np.random.RandomState(0).randint(
        0, 1 << 16, size=(ROWS, n)).astype(np.uint32))
    b = jnp.asarray(np.random.RandomState(1).randint(
        0, 1 << 16, size=(ROWS, n)).astype(np.uint32))
    spec = pl.BlockSpec((ROWS, TILE), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    f = jax.jit(lambda a, b: pl.pallas_call(
        make(op), grid=(n // TILE,), in_specs=[spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((ROWS, n), jnp.uint32))(a, b))
    dt = timeit(name, lambda: f(a, b))
    ops = ROWS * n * REPS_IN_KERNEL
    print(f"  -> {ops/dt/1e9:.1f} G lane-ops/s", flush=True)


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/zkrollup/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    print("devices:", jax.devices(), flush=True)
    n = 1 << LOG_N

    run("u32 mul", lambda a, b: a * b, n)
    run("u32 add", lambda a, b: a + b, n)
    run("u32 shift+mask", lambda a, b: ((a >> 16) & jnp.uint32(0xFFFF)) + b,
        n)
    run("u32 mul via f32 (12-bit safe)",
        lambda a, b: ((a & jnp.uint32(0xFFF)).astype(jnp.float32)
                      * (b & jnp.uint32(0xFFF)).astype(jnp.float32))
        .astype(jnp.uint32), n)
    run("u16->u32 widening-style mul (masked)",
        lambda a, b: (a & jnp.uint32(0xFFFF)) * (b & jnp.uint32(0xFFFF)), n)


if __name__ == "__main__":
    main()
