"""Fused Pallas G2 (Fq2) add/madd/double kernels vs host ground truth.

The differential body lives in tools/g2_kernel_check.py and runs in a
SUBPROCESS with a clean single-device CPU env: eager interpret mode is
~5x slower inside the pytest process (measured 150s vs 31s for one
kernel), and jitting an interpret kernel compiles a ~10^5-op XLA graph.
On TPU the same kernel code compiles through Mosaic and is additionally
exercised end-to-end by the host/device bit-identity proof test
(tests/test_e2e_rollup.py) — the G2 MSM leg runs through these kernels.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # interpret-mode kernel tier


def test_g2_kernels_differential():
    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "g2_kernel_check.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_backend_optimization_level=1"
    # quick subset: interpret mode compiles each kernel body (~4 min for
    # the big Fq2 kernels); full coverage = `python tools/g2_kernel_check.py`
    env["G2_CHECK_SUBSET"] = "quick"
    res = subprocess.run([sys.executable, tool], env=env,
                         capture_output=True, text=True, timeout=560)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-2000:]
    assert "G2KERNELS OK" in res.stdout
