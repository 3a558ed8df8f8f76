"""zkrollup — TPU-native BN254 Groth16 proving framework.

A from-scratch rebuild of the capabilities of kendricktan/simple-zk-rollups
(see SURVEY.md at the repo root) with the snarkjs/circom/websnark proving
chain replaced by JAX/XLA/Pallas kernels: Montgomery limb arithmetic,
batched MiMCSponge, radix-2 NTT, run-merge Pippenger MSM, an R1CS circuit
layer, and Groth16 setup/prove/verify — plus the operator service, chain
bindings, and storage the rollup needs around them.
"""

import os


def _enable_persistent_compile_cache():
    """The deep CIOS/curve graphs cost minutes of XLA compile per process;
    the persistent cache makes that one-time per (shape, code) instead."""
    if os.environ.get("ZKROLLUP_NO_COMPILE_CACHE"):
        return
    try:
        import jax
        cache_dir = os.environ.get(
            "ZKROLLUP_COMPILE_CACHE", os.path.expanduser("~/.cache/zkrollup-xla"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compile_cache()
