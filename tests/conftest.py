"""Test harness: force an 8-device virtual CPU mesh.

Mirrors SURVEY §4.5: multi-chip logic is tested single-process on virtual
devices; the driver separately dry-runs the multi-chip path. Real-TPU benches
live in bench.py, not the test suite.

The session may pre-import jax with a real-TPU platform pinned (e.g. the
axon tunnel registers itself from sitecustomize BEFORE this file runs), so
setting JAX_PLATFORMS here is not enough — use jax.config.update, which wins
over both the env var and an already-registered default.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# XLA:CPU's LLVM -O2 pass takes minutes on the 16-limb CIOS loop body
# (uint32 mul + dynamic-update-slice pattern); -O1 compiles it in ~1s and
# test runtimes are unaffected. TPU (Mosaic/XLA:TPU) is not affected.
if "xla_backend_optimization_level" not in flags:
    flags += " --xla_backend_optimization_level=1"
os.environ["XLA_FLAGS"] = flags.strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Prover Pippenger window for tests. With the scan bucket phase (msm.py
# default) runtime scales with the WINDOW COUNT (W = 256/c) while compile
# cost is roughly window-independent (Blelloch levels depend on n), so a
# moderately large window is best on CPU too; c=8 halves the (2,6) device-
# path work vs the old c=4. Results are window-independent (differentially
# asserted in tests/test_glv.py).
os.environ.setdefault("ZKROLLUP_MSM_WINDOW", "8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NOTE: the persistent compilation cache (jax_compilation_cache_dir) is
# deliberately NOT enabled here: serializing the large CPU MSM executables
# for the cache segfaults this jaxlib (observed in put_executable_and_time
# during test_g1_msm_small). With -O1 the recompiles are cheap enough.
