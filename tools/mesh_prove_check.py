"""Distributed-prover check: prove(mesh=...) on a REAL circuit, verify,
and compare bit-for-bit against a single-chip proof.

Circuits (env MESH_CIRCUIT): toy (default, ~150 s on the 8-device virtual
CPU mesh), withdraw (the production withdraw circuit — n_vars 3585,
domain 4096; ~16 min virtual-CPU compile, chip-checked round 5:
"WITHDRAW MESH OK, bit-identical vs host: True"), or batch:B,D for
BatchProcessTx(B, D) (the (2,4)+ sizes exceed any CI budget on virtual
CPU devices — the production circuit's device path is instead validated
single-chip on TPU by tests/test_e2e_rollup.py's host/device bit-identity
proof).

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    MESH_CIRCUIT=withdraw python tools/mesh_prove_check.py
"""
import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "xla_backend_optimization_level" not in flags:
    flags += " --xla_backend_optimization_level=1"
os.environ["XLA_FLAGS"] = flags.strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("ZKROLLUP_MSM_WINDOW", "8")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def build(which):
    if which == "toy":
        from zkrollup.r1cs.builder import Builder
        bld = Builder(check=True)
        out = bld.alloc_output_deferred()
        x = bld.alloc_public_input(7)
        t = x
        for _ in range(40):
            t = bld.mul(t, t) + x
        bld.bind_output(out, t)
        return bld.r1cs(), bld.witness(), bld.public_signals()
    if which == "withdraw":
        from zkrollup.r1cs.circuits import synthesize_withdraw
        res = synthesize_withdraw(12345678901234567, 42)
        return res.r1cs, res.witness, res.public_signals
    if which.startswith("batch:"):
        b, d = (int(v) for v in which.split(":")[1].split(","))
        from zkrollup.r1cs.circuits import synthesize_batch_process_tx
        from zkrollup.operator.prover import _dummy_tx_inputs
        res = synthesize_batch_process_tx(_dummy_tx_inputs(b, d), b, d,
                                          check=False)
        return res.r1cs, res.witness, res.public_signals
    raise SystemExit(f"unknown MESH_CIRCUIT {which!r}")


def main():
    from zkrollup.dist.mesh import make_mesh
    from zkrollup.groth16.setup import setup
    from zkrollup.groth16.prove import prove
    from zkrollup.groth16.verify import verify
    from zkrollup.native import engine

    which = os.environ.get("MESH_CIRCUIT", "toy")
    r1cs, witness, publics = build(which)
    print(f"{which}: n_vars={r1cs.n_vars} n_cons={r1cs.n_constraints}",
          flush=True)
    pk = setup(r1cs, seed=b"mesh-check")
    mesh = make_mesh(int(os.environ.get("MESH_DEVICES", "8")))
    t0 = time.time()
    pd = prove(pk, r1cs, witness, r=3, s=5, mesh=mesh)
    print(f"mesh prove {time.time() - t0:.1f}s", flush=True)
    assert verify(pk.vk, pd, publics), "mesh proof rejected"
    backend = "host" if engine.available() else "device"
    ps = prove(pk, r1cs, witness, r=3, s=5, backend=backend)
    assert (pd.a, pd.b, pd.c) == (ps.a, ps.b, ps.c), "proofs differ"
    print(f"MESH {which.upper()} OK (bit-identical vs {backend})")


if __name__ == "__main__":
    main()
