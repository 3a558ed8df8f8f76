"""Capture a jax.profiler trace of one device prove (SURVEY §5 tracing).

Writes a TensorBoard-loadable trace under --logdir; the prove pipeline's
stages are labeled with named scopes (groth16.spmv_abc, groth16.quotient,
groth16.msm_g1/g2 — zkrollup/groth16/prove.py) so kernel time attributes
to pipeline stages. Run on the real chip:

    python tools/trace_prove.py --logdir /tmp/zkr_trace
    tensorboard --logdir /tmp/zkr_trace   # or xprof
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/zkr_trace")
    ap.add_argument("--circuit", choices=("withdraw", "tx"),
                    default="withdraw")
    args = ap.parse_args()

    import jax
    from zkrollup.groth16.setup import setup
    from zkrollup.groth16.prove import prove
    from zkrollup.groth16.verify import verify
    from zkrollup.ref import eddsa
    from zkrollup.r1cs.circuits import (synthesize_withdraw,
                                        synthesize_batch_process_tx)

    print("devices:", jax.devices(), flush=True)
    if args.circuit == "withdraw":
        res = synthesize_withdraw(
            eddsa.format_priv_key_for_babyjub(12345), 777)
    else:
        from zkrollup.config import RollupConfig
        from zkrollup.operator.prover import _dummy_tx_inputs
        cfg = RollupConfig()
        res = synthesize_batch_process_tx(
            _dummy_tx_inputs(cfg.batch_size, cfg.tree_depth),
            cfg.batch_size, cfg.tree_depth, check=False)
    pk = setup(res.r1cs, seed=b"trace")
    print(f"setup done (domain {pk.domain_size})", flush=True)

    # warm-up: compile everything OUTSIDE the trace window
    prove(pk, res.r1cs, res.witness, r=3, s=5, backend="device")
    print("warmed up; tracing one prove...", flush=True)

    with jax.profiler.trace(args.logdir):
        t0 = time.time()
        proof = prove(pk, res.r1cs, res.witness, r=3, s=5, backend="device")
        dt = time.time() - t0
    assert verify(pk.vk, proof, res.public_signals)
    print(f"traced prove: {dt:.2f}s -> {args.logdir}", flush=True)


if __name__ == "__main__":
    main()
