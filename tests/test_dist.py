"""Distributed (8-virtual-device mesh) layer: relayout collective, sharded
NTT/MSM, and the fully sharded quotient pipeline vs the single-device
reference pipeline (differential, SURVEY §4.5)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from zkrollup.dist.mesh import (make_mesh, cyclic_shard, block_shard,
                                unblock, blocked_to_cyclic, sharded_ntt,
                                sharded_msm_g1, sharded_msm_g2,
                                sharded_quotient)
from zkrollup.fields.mont import FR
from zkrollup.fields import limbs as L
from zkrollup.ntt.ntt import (ntt_mont, intt_mont, coset_ntt_mont,
                              coset_intt_mont, COSET_SHIFT)
from zkrollup.curve import g1_jax, g2_jax
from zkrollup.ref import bn254 as ref

# shard_map/collective classes are compile-heavy (slow tier); TestRelayout
# is a cheap smoke of the mesh plumbing and stays in the fast tier
pytestmark_sharded = pytest.mark.slow

D = 8
LOG_N = 8  # 256-point domain: L = 32, L % D == 0
N = 1 << LOG_N


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= D
    return make_mesh(D)


@pytest.fixture(scope="module")
def x_mont():
    rng = np.random.RandomState(11)
    return jnp.asarray(FR.to_mont_host(
        [int(v) for v in rng.randint(1, 1 << 30, size=N)]))


class TestRelayout:
    def test_blocked_to_cyclic_matches_host(self, mesh, x_mont):
        blocked = block_shard(x_mont, D)
        cyc = blocked_to_cyclic(mesh, blocked)
        want = np.asarray(cyclic_shard(x_mont, D))
        assert (np.asarray(cyc) == want).all()


@pytestmark_sharded
class TestShardedNtt:
    def test_forward_matches_single_device(self, mesh, x_mont):
        got = unblock(sharded_ntt(mesh, cyclic_shard(x_mont, D), LOG_N))
        want = ntt_mont(x_mont)
        assert (np.asarray(got) == np.asarray(want)).all()

    def test_inverse_roundtrip(self, mesh, x_mont):
        fwd = sharded_ntt(mesh, cyclic_shard(x_mont, D), LOG_N)
        back = sharded_ntt(mesh, blocked_to_cyclic(mesh, fwd), LOG_N,
                           inverse=True)
        assert (np.asarray(unblock(back)) == np.asarray(x_mont)).all()


@pytestmark_sharded
class TestShardedMsm:
    def test_g1_matches_host(self, mesh):
        rng = np.random.RandomState(5)
        n = D * 8
        ks = [int(v) for v in rng.randint(1, 1 << 20, size=n)]
        ss = [int(v) for v in rng.randint(1, 1 << 20, size=n)]
        pts = [ref.g1_mul(ref.G1_GEN, k) for k in ks]
        x, y, inf = g1_jax.pack_affine_host(pts)
        sc = jnp.asarray(L.ints_to_limbs(ss))
        res = sharded_msm_g1(
            mesh, (jnp.asarray(x), jnp.asarray(y), jnp.asarray(inf)), sc, c=4)
        got = g1_jax.to_affine_host(
            tuple(np.asarray(c).reshape(1, L.N_LIMBS) for c in res))[0]
        want = ref.g1_mul(ref.G1_GEN, sum(k * s for k, s in zip(ks, ss)))
        assert got == want

    def test_g2_matches_host(self, mesh):
        rng = np.random.RandomState(6)
        n = D * 4
        ks = [int(v) for v in rng.randint(1, 1 << 16, size=n)]
        ss = [int(v) for v in rng.randint(1, 1 << 16, size=n)]
        pts = [ref.g2_mul(ref.G2_GEN, k) for k in ks]
        (x0, x1), (y0, y1), inf = g2_jax.pack_affine_host(pts)
        sc = jnp.asarray(L.ints_to_limbs(ss))
        res = sharded_msm_g2(
            mesh, ((jnp.asarray(x0), jnp.asarray(x1)),
                   (jnp.asarray(y0), jnp.asarray(y1)), jnp.asarray(inf)),
            sc, c=4)
        rs = lambda c: (np.asarray(c[0]).reshape(1, L.N_LIMBS),
                        np.asarray(c[1]).reshape(1, L.N_LIMBS))
        got = g2_jax.to_affine_host(tuple(rs(c) for c in res))[0]
        want = ref.g2_mul(ref.G2_GEN, sum(k * s for k, s in zip(ks, ss)))
        assert got == want


@pytestmark_sharded
class TestShardedQuotient:
    def test_matches_single_device_pipeline(self, mesh):
        rng = np.random.RandomState(7)
        a = jnp.asarray(FR.to_mont_host(
            [int(v) for v in rng.randint(1, 1 << 30, size=N)]))
        b = jnp.asarray(FR.to_mont_host(
            [int(v) for v in rng.randint(1, 1 << 30, size=N)]))
        c = jnp.asarray(FR.to_mont_host(
            [int(v) for v in rng.randint(1, 1 << 30, size=N)]))
        z_coset = (pow(COSET_SHIFT, N, FR.p) - 1) % FR.p
        zinv = FR.const_mont(pow(z_coset, FR.p - 2, FR.p))

        # single-device reference pipeline (groth16/prove.py _quotient_plain)
        ca = coset_ntt_mont(intt_mont(a))
        cb = coset_ntt_mont(intt_mont(b))
        cc = coset_ntt_mont(intt_mont(c))
        want = FR.from_mont(coset_intt_mont(
            FR.mont_mul(FR.sub(FR.mont_mul(ca, cb), cc), zinv)))

        got = sharded_quotient(
            mesh, cyclic_shard(a, D), cyclic_shard(b, D), cyclic_shard(c, D),
            zinv, LOG_N)
        assert (np.asarray(unblock(got)) == np.asarray(want)).all()


@pytestmark_sharded
class TestDistributedProve:
    """prove(mesh=...) — the multi-chip prover entry (VERDICT r3 #6):
    sharded quotient + five sharded MSMs must yield the SAME proof as the
    single-chip path with pinned (r, s)."""

    def _circuit(self):
        from zkrollup.r1cs.builder import Builder
        bld = Builder(check=True)
        out = bld.alloc_output_deferred()
        x = bld.alloc_public_input(7)
        t = x
        for _ in range(40):
            t = bld.mul(t, t) + x
        bld.bind_output(out, t)
        return bld

    def test_mesh_prove_bit_identical_and_verifies(self):
        from zkrollup.dist.mesh import make_mesh
        from zkrollup.groth16.setup import setup
        from zkrollup.groth16.prove import prove
        from zkrollup.groth16.verify import verify
        from zkrollup.native import engine

        bld = self._circuit()
        r1cs, witness = bld.r1cs(), bld.witness()
        pk = setup(r1cs, seed=b"dist-prove")
        mesh = make_mesh(8)

        p_dist = prove(pk, r1cs, witness, r=3, s=5, mesh=mesh)
        assert verify(pk.vk, p_dist, bld.public_signals())

        backend = "host" if engine.available() else "device"
        p_one = prove(pk, r1cs, witness, r=3, s=5, backend=backend)
        assert (p_dist.a, p_dist.b, p_dist.c) == (p_one.a, p_one.b, p_one.c)


@pytestmark_sharded
class TestMultiHost:
    """Simulated multi-host: 2 controller processes over loopback through
    dist/launch.py init_distributed (the jax.distributed path no
    single-process test can reach)."""

    def test_two_process_collectives(self):
        import subprocess, sys, os
        tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                            "multihost_sim.py")
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        res = subprocess.run([sys.executable, tool], env=env,
                             capture_output=True, text=True, timeout=500)
        assert res.returncode == 0, res.stdout[-2000:]
        assert "MULTIHOST OK" in res.stdout


@pytestmark_sharded
class TestTableGroupProve:
    """EP/PP axis: the five MSM tables scheduled onto DISJOINT chip groups
    (4 groups x 2 devices on the virtual mesh) must reproduce the
    whole-mesh proof bit-for-bit."""

    def test_grouped_equals_whole_mesh(self):
        from zkrollup.dist.mesh import make_mesh
        from zkrollup.groth16.setup import setup
        from zkrollup.groth16.prove import prove
        from zkrollup.groth16.verify import verify
        from zkrollup.r1cs.builder import Builder

        bld = Builder(check=True)
        out = bld.alloc_output_deferred()
        x = bld.alloc_public_input(7)
        t = x
        for _ in range(40):
            t = bld.mul(t, t) + x
        bld.bind_output(out, t)
        r1cs, witness = bld.r1cs(), bld.witness()
        pk = setup(r1cs, seed=b"ep-prove")
        mesh = make_mesh(8)

        p_full = prove(pk, r1cs, witness, r=3, s=5, mesh=mesh)
        p_grp = prove(pk, r1cs, witness, r=3, s=5, mesh=mesh,
                      table_groups=4)
        assert (p_full.a, p_full.b, p_full.c) == (p_grp.a, p_grp.b, p_grp.c)
        assert verify(pk.vk, p_grp, bld.public_signals())


class TestDistTablePadding:
    """Shape-level checks of the mesh key-table padding at REAL (2,6)
    dimensions (n_vars 117114, domain 2^17) — the layouts that
    prove(mesh=...) reshapes into (d, pad/d) blocks — including mesh
    sizes that do NOT divide the domain (the r4 advisor finding). Fast:
    no curve math, just the padding arithmetic on zero tables."""

    def _fake_pk(self, n_vars=117114, n_public=75, m=1 << 17):
        import types
        z1 = np.zeros((n_vars, 16), np.uint32)
        inf = np.ones((n_vars, 1), bool)
        g1 = (z1, z1.copy(), inf)
        zh = np.zeros((m - 1, 16), np.uint32)
        h = (zh, zh.copy(), np.ones((m - 1, 1), bool))
        zc = np.zeros((n_vars - n_public, 16), np.uint32)
        c = (zc, zc.copy(), np.ones((n_vars - n_public, 1), bool))
        b2 = ((z1, z1.copy()), (z1.copy(), z1.copy()), inf.copy())
        return types.SimpleNamespace(
            domain_size=m, n_vars=n_vars, n_public=n_public,
            a_g1=g1, b1_g1=g1, c_g1=c, h_g1=h, b2_g2=b2)

    @pytest.mark.parametrize("d", [6, 8, 12])
    def test_pad_divisible_at_production_shapes(self, d):
        from zkrollup.groth16.prove import _dist_tables
        pk = self._fake_pk()
        tbl = _dist_tables(pk, d)
        pad_to = tbl["pad_to"]
        assert pad_to % d == 0
        assert pad_to >= max(pk.domain_size, pk.n_vars)
        for key in ("a", "b1", "c", "h"):
            x, y, inf = tbl[key]
            assert x.shape[0] == pad_to and inf.shape[0] == pad_to
        (bx0, bx1), (by0, by1), binf = tbl["b2"]
        assert bx0.shape[0] == pad_to and binf.shape[0] == pad_to
