"""Simulated multi-host run: 2 controller processes over the loopback.

Exercises the REAL multi-host path (dist/mesh.py init_distributed ->
jax.distributed.initialize) that single-process virtual-device tests
cannot: cross-process device discovery, a global mesh spanning both
processes, and collectives through the distributed runtime — the DCN
analog of SURVEY §2.5's comm-backend row, minus real hardware.

Usage (driver): python tools/multihost_sim.py
  - parent spawns 2 child controllers (this file with ZKR_MH_RANK set)
  - each child: 2 virtual CPU devices -> global mesh of 4
  - checks: global psum, sharded four-step NTT vs single-device reference
  - exit 0 iff both children succeed
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

COORD = "127.0.0.1:19731"
N_PROC = 2
LOCAL_DEVICES = 2


def child(rank: int) -> int:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES} "
        "--xla_backend_optimization_level=1")
    os.environ["JAX_PLATFORMS"] = "cpu"
    # initialize the distributed runtime BEFORE anything touches the XLA
    # backend (zkrollup.dist.mesh builds device constants at import)
    from zkrollup.dist.launch import init_distributed
    init_distributed(coordinator=COORD, num_processes=N_PROC,
                     process_id=rank)
    import jax
    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from functools import partial

    devs = jax.devices()
    assert len(devs) == N_PROC * LOCAL_DEVICES, \
        f"global device count {len(devs)}"
    mesh = Mesh(np.array(devs), ("dev",))

    # 1: cross-process psum
    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=P("dev"), out_specs=P("dev"))
    def allsum(x):
        return jnp.broadcast_to(jax.lax.psum(jnp.sum(x), "dev"), x.shape)

    n_dev = N_PROC * LOCAL_DEVICES

    def global_put(np_arr, spec):
        sharding = jax.sharding.NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            np_arr.shape, sharding, lambda idx: np_arr[idx])

    arr = global_put(np.arange(n_dev, dtype=np.float32), P("dev"))
    total = float(np.asarray(jax.jit(lambda a: allsum(a))(arr)
                             .addressable_shards[0].data)[0])
    assert total == sum(range(n_dev)), total

    # 2: sharded four-step NTT across BOTH processes vs host reference
    from zkrollup.dist.mesh import sharded_ntt, cyclic_shard, unblock
    from zkrollup.fields.mont import FR
    from zkrollup.fields.limbs import limbs_to_ints
    from zkrollup.ntt.ntt import domain_root

    log_n, n = 4, 16
    vals = [(7 * i + 3) % 97 for i in range(n)]
    x = jnp.asarray(FR.to_mont_host(vals))
    x_cyc = global_put(np.asarray(cyclic_shard(x, n_dev)), P("dev"))
    out = sharded_ntt(mesh, x_cyc, log_n)
    # multi-process arrays are only partially addressable: every process
    # checks ITS shards (blocked layout: device d holds X[d*L .. d*L+L-1])
    w = domain_root(log_n)
    p = FR.p
    want = [sum(v * pow(w, i * j, p) for j, v in enumerate(vals)) % p
            for i in range(n)]
    l_per_dev = n // n_dev
    checked = 0
    for shard in out.addressable_shards:
        d = shard.index[0].start or 0
        rows = np.asarray(shard.data).reshape(-1, 16)
        got = limbs_to_ints(np.asarray(FR.from_mont(jnp.asarray(rows))))
        lo = d * l_per_dev
        assert got == want[lo:lo + len(got)], (rank, d, got)
        checked += 1
    assert checked == LOCAL_DEVICES, checked
    print(f"rank {rank}: psum + sharded NTT shards verified", flush=True)
    if rank == 0:
        print("MULTIHOST OK", flush=True)
    return 0


def parent() -> int:
    procs = []
    for r in range(N_PROC):
        env = dict(os.environ, ZKR_MH_RANK=str(r))
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=None if r == 0 else subprocess.DEVNULL,
            stderr=subprocess.STDOUT if r == 0 else subprocess.DEVNULL))
    rc = 0
    for p in procs:
        try:
            rc |= p.wait(timeout=480)
        except subprocess.TimeoutExpired:
            p.kill()
            rc |= 1
    print(f"multihost sim rc={rc}", flush=True)
    return rc


if __name__ == "__main__":
    rank = os.environ.get("ZKR_MH_RANK")
    sys.exit(child(int(rank)) if rank is not None else parent())
