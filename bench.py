"""Headline benchmark — run on real TPU by the driver.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} — the
BN254 G1 MSM throughput at 2^17 points (BASELINE.json config 3; websnark's
multiexp is the reference's hottest kernel).

vs_baseline is MEASURED, not assumed (BASELINE.md: the reference publishes
no numbers): the same 2^17 MSM through this repo's native C++ Pippenger
pinned to ONE host core (ZKH_THREADS=1) — the websnark-WASM-class
single-core CPU engine the reference actually ran, on this machine.

The full BASELINE metric set (configs 1-5) is written to BENCH_EXTRA.json
next to this file:
  - bn254_g1_msm_points_per_s     config 3, TPU 1 chip
  - ntt_elements_per_s            config 2, 2^20-point Fr NTT, TPU 1 chip
  - mimc_hashes_per_s             config 1, batched MiMCSponge pair-hash
  - groth16_proofs_per_s          config 4, flagship BatchProcessTx(2,6):
        device-pipeline number BY DEFAULT (BENCH_DEVICE_PROVE=0 skips;
        the persistent cache makes reruns cheap) plus the host-engine
        number (operator-grade, 2 CPU cores) as the measured baseline
  - msm_scaling_model             config 5: bytes moved / collective count
        for the sharded MSM on a D-device mesh (wall-clock on virtual CPU
        devices is meaningless; the model backs the >=80% target)

Stage timings go to stderr for humans.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

LOG_N = int(os.environ.get("BENCH_MSM_LOG_N", "17"))
MSM_WINDOW = int(os.environ.get("BENCH_MSM_WINDOW", "12"))
# GLV measured SLOWER than plain on the run-merge design (r4 matrix:
# 69.1k vs 80.7k pts/s at c=10) — plain is the default now.
USE_GLV = os.environ.get("BENCH_GLV", "0") != "0"
EXTRA_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BENCH_EXTRA.json")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _timeit(fn, reps=3):
    import jax
    t0 = time.time()
    jax.block_until_ready(fn())
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        jax.block_until_ready(fn())
    return compile_s, (time.time() - t0) / reps


def _distinct_points(n, tag):
    """n DISTINCT affine points (mont limbs), cached npz — the real
    proving-key-table point distribution (VERDICT r4 weak #6; replaces the
    64-points-tiled input of earlier rounds)."""
    import numpy as np
    cache = os.path.expanduser(f"~/.cache/zkrollup/msm_points_{tag}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        if z["x"].shape[0] >= n:
            return z["x"][:n], z["y"][:n], z["inf"][:n]
    from zkrollup.msm.fixed_base import g1_points_from_scalars
    rng = np.random.RandomState(42)
    sc_vals = np.unique(rng.randint(1, 1 << 62, size=2 * n))[:n]
    assert sc_vals.shape[0] == n
    x, y, inf = g1_points_from_scalars([int(v) for v in sc_vals])
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    np.savez(cache, x=np.asarray(x), y=np.asarray(y), inf=np.asarray(inf))
    return np.asarray(x), np.asarray(y), np.asarray(inf)


def bench_msm(extra):
    import random
    import numpy as np
    import jax
    import jax.numpy as jnp
    from functools import partial

    from zkrollup.ref import bn254 as ref
    from zkrollup.curve import g1_jax
    from zkrollup.fields import limbs as L
    from zkrollup.msm.msm import msm_host_combine
    from zkrollup.msm import glv

    random.seed(1234)
    n = 1 << LOG_N
    x, y, inf = _distinct_points(n, str(LOG_N))
    pa = (jnp.asarray(x), jnp.asarray(y), jnp.asarray(inf))
    scalars = [random.randrange(ref.R) for _ in range(n)]
    sc_limbs = L.ints_to_limbs(scalars)

    if USE_GLV:
        def run():
            return glv.msm_glv(pa, sc_limbs, c=MSM_WINDOW)
        variant = f"GLV, window c={MSM_WINDOW}"
    else:
        sc = jnp.asarray(sc_limbs)

        def run():
            # chunked-scan window sums on device + host Horner (the
            # production prover path); distinct=True as for real key
            # tables (no-double-path kernels)
            return msm_host_combine(g1_jax.G1, pa, sc, c=MSM_WINDOW,
                                    distinct=True)
        variant = f"chunked scan c={MSM_WINDOW}, host combine, distinct"

    compile_s, dt = _timeit(run)
    log(f"msm compile+first: {compile_s:.1f}s; steady {dt:.2f}s "
        f"-> {n / dt:,.0f} points/s")
    pts_per_s = n / dt

    # measured single-core CPU baseline: this repo's native C++ Pippenger
    # (the websnark-class engine), same points/scalars, ZKH_THREADS=1
    baseline = None
    from zkrollup.native import engine
    if engine.available():
        os.environ["ZKH_THREADS"] = "1"
        tbl = engine.pack_g1_table_mont((x, y, inf))
        sc_b = engine.ints_to_fr_bytes(scalars)
        t0 = time.time()
        engine.g1_msm_pip(tbl, sc_b, n)
        cpu_dt = time.time() - t0
        os.environ.pop("ZKH_THREADS", None)
        baseline = n / cpu_dt
        log(f"cpu 1-core baseline: {cpu_dt:.2f}s -> {baseline:,.0f} pts/s")

    extra["bn254_g1_msm_points_per_s"] = {
        "value": round(pts_per_s, 1),
        "unit": f"points/s (2^{LOG_N} MSM, {variant}, 1 chip)",
        "cpu_1core_baseline": round(baseline, 1) if baseline else None,
    }
    return pts_per_s, baseline


def bench_ntt(extra):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from zkrollup.fields.mont import FR
    from zkrollup.ntt.ntt import ntt_mont

    log_n = int(os.environ.get("BENCH_NTT_LOG_N", "20"))
    n = 1 << log_n
    rng = np.random.RandomState(0)
    vals = [int(v) for v in rng.randint(1, 1 << 62, size=n)]
    a = jnp.asarray(FR.to_mont_host(vals))
    f = jax.jit(lambda v: ntt_mont(v))
    compile_s, dt = _timeit(lambda: f(a))
    log(f"ntt 2^{log_n}: compile {compile_s:.1f}s steady {dt * 1000:.1f}ms "
        f"-> {n / dt:,.0f} elements/s")
    baseline = None
    from zkrollup.native import engine
    if engine.available():
        os.environ["ZKH_THREADS"] = "1"
        data = engine.ints_to_fr_bytes(vals)
        t0 = time.time()
        engine.fr_ntt_bytes(data, n, False)
        cpu_dt = time.time() - t0
        os.environ.pop("ZKH_THREADS", None)
        baseline = n / cpu_dt
        log(f"ntt cpu 1-core baseline: {cpu_dt:.2f}s "
            f"-> {baseline:,.0f} elements/s")
    extra["ntt_elements_per_s"] = {
        "value": round(n / dt, 1),
        "unit": f"elements/s (2^{log_n}-point Fr NTT, 1 chip)",
        "transforms_per_s": round(1 / dt, 2),
        "cpu_1core_baseline": round(baseline, 1) if baseline else None,
    }


def bench_mimc(extra):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from zkrollup.fields.mont import FR
    from zkrollup.hash import mimc_jax

    log_p = int(os.environ.get("BENCH_MIMC_LOG_PAIRS", "17"))
    n_pairs = 1 << log_p
    rng = np.random.RandomState(1)
    vals = [int(v) for v in rng.randint(1, 1 << 62, size=2 * n_pairs)]
    nodes = jnp.asarray(FR.to_mont_host(vals))
    f = jax.jit(mimc_jax.merkle_level_up)
    compile_s, dt = _timeit(lambda: f(nodes))
    log(f"mimc 2^{log_p} pair-hashes: compile {compile_s:.1f}s "
        f"steady {dt * 1000:.1f}ms -> {n_pairs / dt:,.0f} hashes/s")
    baseline = None
    from zkrollup.native import engine
    if engine.available():
        os.environ["ZKH_THREADS"] = "1"
        sub = min(n_pairs, 1 << 13)       # 1-core C++ is slow; subsample
        rows = [[vals[2 * i], vals[2 * i + 1]] for i in range(sub)]
        t0 = time.time()
        engine.mimc_multi_hash_many(rows)
        cpu_dt = time.time() - t0
        os.environ.pop("ZKH_THREADS", None)
        baseline = sub / cpu_dt
        log(f"mimc cpu 1-core baseline: {baseline:,.0f} hashes/s "
            f"(measured on {sub})")
    extra["mimc_hashes_per_s"] = {
        "value": round(n_pairs / dt, 1),
        "unit": f"MiMCSponge pair hashes/s (batch 2^{log_p}, 1 chip)",
        "cpu_1core_baseline": round(baseline, 1) if baseline else None,
    }


def bench_proofs(extra):
    """Config 4: flagship BatchProcessTx(2,6) proofs/s with witness/prove/
    verify split. Host engine always (the operator-grade CPU number);
    device pipeline by default (BENCH_DEVICE_PROVE=0 to skip)."""
    from zkrollup.config import RollupConfig
    from zkrollup.operator.prover import TxProver
    from zkrollup.ref import eddsa
    from zkrollup.tree.merkle import MerkleTree
    from zkrollup.witness.assembler import (Transaction, format_tx,
                                            hash_balance_tree_leaf,
                                            assemble_batch_inputs)
    from zkrollup.r1cs.circuits import synthesize_batch_process_tx
    from zkrollup.groth16.prove import prove
    from zkrollup.groth16.verify import verify
    from zkrollup.native import engine

    cfg = RollupConfig()
    key_path = os.path.expanduser(
        f"~/.cache/zkrollup/tx_{cfg.batch_size}_{cfg.tree_depth}.npz")
    os.makedirs(os.path.dirname(key_path), exist_ok=True)
    p = TxProver(cfg, key_path=key_path, setup_seed=b"bench")
    t0 = time.time()
    pk = p.ensure_keys()
    log(f"proof keys ready in {time.time() - t0:.1f}s "
        f"(domain {pk.domain_size})")

    priv_a, priv_b = 12345, 67890
    pub_a, pub_b = eddsa.gen_public_key(priv_a), eddsa.gen_public_key(priv_b)
    tree = MerkleTree(cfg.tree_depth)
    for pub in (pub_a, pub_b):
        raw = {"publicKey": pub, "balance": 10 ** 18, "nonce": 0}
        tree.insert_(hash_balance_tree_leaf(raw), raw)
    txs = []
    for nonce, amt in ((1, 10 ** 17), (2, 2 * 10 ** 17)):
        tx = Transaction(0, 1, amt, amt // 1000 * 3, nonce)
        tx.signature = eddsa.sign(priv_a, format_tx(tx))
        txs.append(tx)

    t0 = time.time()
    inputs, _ = assemble_batch_inputs(tree, txs)
    # witness-only replay against the prover's cached structure R1CS
    res = synthesize_batch_process_tx(inputs, cfg.batch_size,
                                      cfg.tree_depth, record=False)
    r1cs = p._structure_r1cs()
    witness_s = time.time() - t0

    entry = {"witness_s": round(witness_s, 2)}
    if engine.available():
        t0 = time.time()
        proof = prove(pk, r1cs, res.witness, backend="host")
        host_prove_s = time.time() - t0
        t0 = time.time()
        assert verify(pk.vk, proof, res.public_signals)
        verify_s = time.time() - t0
        total = witness_s + host_prove_s + verify_s
        log(f"host prove {host_prove_s:.2f}s verify {verify_s:.2f}s "
            f"witness {witness_s:.2f}s -> {1 / total:.3f} proofs/s")
        entry.update({
            "host_prove_s": round(host_prove_s, 2),
            "verify_s": round(verify_s, 3),
            "host_proofs_per_s": round(1 / total, 4),
        })
    if os.environ.get("BENCH_DEVICE_PROVE", "1") == "1":
        def run():
            return prove(pk, r1cs, res.witness, backend="device")
        t0 = time.time()
        proof = run()
        compile_s = time.time() - t0
        t0 = time.time()
        proof = run()
        dev_prove_s = time.time() - t0
        assert verify(pk.vk, proof, res.public_signals)
        total = witness_s + dev_prove_s
        log(f"device prove: compile+first {compile_s:.1f}s "
            f"steady {dev_prove_s:.2f}s -> {1 / total:.3f} proofs/s")
        entry.update({
            "device_prove_s": round(dev_prove_s, 2),
            "device_proofs_per_s": round(1 / total, 4),
        })
    entry["unit"] = ("proofs/s, BatchProcessTx(2,6) incl. witness "
                     "synthesis + self-verify")
    extra["groth16_proofs_per_s"] = entry


def bench_scaling_model(extra):
    """Config 5 model: communication volume of the sharded MSM + four-step
    NTT on a D-device mesh. Virtual-CPU wall-clock is meaningless, so emit
    the collective count/bytes that set the scaling ceiling: compute grows
    ~n/D per chip while the MSM all_gather stays O(D * point) and the NTT
    moves each element through exactly ONE all_to_all."""
    d = int(os.environ.get("BENCH_SCALING_DEVICES", "8"))
    n = 1 << LOG_N
    limb_bytes = 16 * 4
    jac_point_bytes = 3 * limb_bytes
    msm_allgather_bytes = d * jac_point_bytes          # D partials
    ntt_all_to_all_bytes = n * limb_bytes              # one relayout
    per_chip_work = n // d
    # comm/compute ratio per chip, using measured single-chip points/s as
    # the compute rate and ICI-class bandwidth (~100 GB/s) as the link
    msm_entry = extra.get("bn254_g1_msm_points_per_s") or {}
    chip_rate = msm_entry.get("value") or 0
    t_compute = per_chip_work / chip_rate if chip_rate else None
    t_comm = msm_allgather_bytes / 100e9
    eff = (t_compute / (t_compute + t_comm)) if t_compute else None
    extra["msm_scaling_model"] = {
        "devices": d,
        "msm_allgather_bytes": msm_allgather_bytes,
        "msm_collectives": 1,
        "ntt_all_to_all_bytes": ntt_all_to_all_bytes,
        "ntt_collectives_per_transform": 1,
        "modeled_efficiency_at_d": round(eff, 6) if eff else None,
        "note": ("sharded MSM moves D Jacobian partials once; modeled "
                 "efficiency >=0.999 at D=8 since comm is O(D) while "
                 "compute is O(n/D); virtual-CPU wall-clock not meaningful "
                 "(BASELINE config 5 target >=0.80)"),
    }


def main():
    import jax
    if jax.default_backend() not in ("cpu",):
        # persistent compile cache: the MSM graph takes minutes to compile
        # on a fresh process; cached reruns skip it. (Not on CPU: serializing
        # the big CPU executables segfaults this jaxlib — tests/conftest.)
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/zkrollup/jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    log(f"devices: {jax.devices()}")

    extra = {}
    pts_per_s, baseline = bench_msm(extra)
    # print the headline IMMEDIATELY: pallas executables are not persisted
    # by the compilation cache, so the extra metrics below pay real compile
    # time — a driver-side timeout must not lose the headline measurement
    vs = round(pts_per_s / baseline, 2) if baseline else None
    print(json.dumps({
        "metric": "bn254_g1_msm_points_per_s",
        "value": round(pts_per_s, 1),
        "unit": (f"points/s (2^{LOG_N} MSM, window c={MSM_WINDOW}, 1 chip, "
                 "distinct points; baseline = same MSM on this repo's "
                 "native C++ Pippenger, 1 CPU core, measured)"),
        "vs_baseline": vs,
    }), flush=True)

    for fn in (bench_ntt, bench_mimc, bench_proofs, bench_scaling_model):
        try:
            fn(extra)
        except Exception as e:  # an extra metric must not kill the headline
            log(f"extra metric {fn.__name__} failed: {e!r}")
        # checkpoint after every metric: partial results survive a timeout
        with open(EXTRA_PATH, "w") as f:
            json.dump(extra, f, indent=1)
    log(f"extra metrics -> {EXTRA_PATH}")


if __name__ == "__main__":
    main()
