"""Test harness: force an 8-device virtual CPU mesh BEFORE jax imports.

Mirrors SURVEY §4.5: multi-chip logic is tested single-process on virtual
devices; the driver separately dry-runs the multi-chip path. Real-TPU benches
live in bench.py, not the test suite.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# XLA:CPU's LLVM -O2 pass takes minutes on the 16-limb CIOS loop body
# (uint32 mul + dynamic-update-slice pattern); -O1 compiles it in ~1s and
# test runtimes are unaffected. TPU (Mosaic/XLA:TPU) is not affected.
if "xla_backend_optimization_level" not in flags:
    flags += " --xla_backend_optimization_level=1"
os.environ["XLA_FLAGS"] = flags.strip()
