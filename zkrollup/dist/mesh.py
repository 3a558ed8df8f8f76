"""Multi-chip sharding: device mesh + distributed MSM / NTT (SURVEY §2.5).

The reference is entirely sequential (one Node process + one WASM instance);
every axis here is new design, mapped to TPU collectives over ICI:

  MSM   points + scalars sharded over the `dev` axis; each chip runs the
        full windowed run-merge pipeline on its shard (msm/msm.py), partial
        results are combined with a log-depth fold after an all_gather of
        D Jacobian points (tiny).
  NTT   four-step decomposition n = D * L: cyclic-shard by residue j1,
        local NTT_L per chip, twiddle by w_n^(j1*k2), then the D-point
        transform across chips via all_gather of the (D, L) rows — one
        ICI collective per transform.

Multi-host: the same shard_map code runs under jax.distributed with a mesh
spanning hosts (DCN between slices); init_distributed() wires the
controller.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from jax.experimental.shard_map import shard_map

from ..fields.mont import FR
from ..fields import limbs as L
from ..curve import g1_jax, g2_jax
from ..msm.msm import msm
from ..ntt import ntt as ntt_mod


def make_mesh(n_devices: Optional[int] = None, axis: str = "dev") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


# re-export: real definition lives in launch.py, which is importable
# BEFORE backend init (this module builds device constants at import —
# too late to call jax.distributed.initialize)
from .launch import init_distributed  # noqa: F401,E402


# -- distributed MSM --------------------------------------------------------
#
# The shard_map-wrapped programs are built by lru_cached factories keyed on
# (mesh, window, ...): repeated calls with the same mesh/params reuse ONE
# jitted function, so XLA's shape-keyed executable cache kicks in. Without
# this, every call builds a fresh closure and re-traces + re-compiles the
# whole program — the Groth16 prover issues the same G1 MSM program for the
# A/C/h tables, and compile dominates wall-clock on small runs (the driver
# dryrun timed out on exactly this in round 2).


@lru_cache(maxsize=2)
def _fold_fn(curve_kind: str):
    """Jitted log-depth fold of the D gathered Jacobian partials. One
    compiled program instead of dozens of per-op eager compiles (the fold
    is tiny at runtime but eager field ops each pay a first-call compile).
    Non-power-of-two partial counts are padded with the point at infinity
    so the halving split stays shape-consistent."""
    curve = g1_jax.G1 if curve_kind == "g1" else g2_jax.G2

    @jax.jit
    def fold(p):
        n = jax.tree_util.tree_leaves(p)[0].shape[0]
        n_pad = 1 << max((n - 1).bit_length(), 0)
        if n_pad != n:
            inf = curve.infinity((n_pad - n,))
            p = jax.tree_util.tree_map(
                lambda a, i: jnp.concatenate([a, i], axis=0), p, inf)
            n = n_pad
        while n > 1:
            half = n // 2
            lo = jax.tree_util.tree_map(lambda a: a[:half], p)
            hi = jax.tree_util.tree_map(lambda a: a[half:n], p)
            p = curve.add(lo, hi)
            n = half
        return jax.tree_util.tree_map(lambda a: a[0], p)

    return fold


def _fold_parts(curve, p):
    return _fold_fn("g1" if curve is g1_jax.G1 else "g2")(p)


@lru_cache(maxsize=16)
def _msm_g1_local(mesh: Mesh, c: int):
    axis = mesh.axis_names[0]
    curve = g1_jax.G1

    @jax.jit
    @partial(shard_map, mesh=mesh, check_rep=False,
             in_specs=((P(axis), P(axis), P(axis)), P(axis)),
             out_specs=P(axis))
    def local_part(pa, sc):
        part = msm(curve, pa, sc, c=c)            # local shard's MSM
        return jax.tree_util.tree_map(lambda a: a[None], part)

    return local_part


def sharded_msm_g1(mesh: Mesh, points_affine, scalars, c: int = 10):
    """points_affine: (x, y, inf) host/device arrays (n, ...); scalars
    (n, 16). n must divide evenly by mesh size. Returns a single Jacobian
    point. Data-parallel over points; one all_gather of D partials."""
    parts = _msm_g1_local(mesh, c)(points_affine, scalars)  # leaves (D, 16)
    return _fold_parts(g1_jax.G1, parts)


@lru_cache(maxsize=16)
def _msm_g2_local(mesh: Mesh, c: int):
    axis = mesh.axis_names[0]
    curve = g2_jax.G2
    pt_spec = ((P(axis), P(axis)), (P(axis), P(axis)), P(axis))

    @jax.jit
    @partial(shard_map, mesh=mesh, check_rep=False,
             in_specs=(pt_spec, P(axis)), out_specs=P(axis))
    def local_part(pa, sc):
        part = msm(curve, pa, sc, c=c)
        return jax.tree_util.tree_map(lambda a: a[None], part)

    return local_part


def sharded_msm_g2(mesh: Mesh, points_affine, scalars, c: int = 10):
    """G2 variant of sharded_msm_g1: points ((x0,x1),(y0,y1),inf) with
    leaves (n, 16)/(n, 1), sharded over the mesh axis; one all_gather of D
    Jacobian partials + log-depth fold."""
    parts = _msm_g2_local(mesh, c)(points_affine, scalars)
    return _fold_parts(g2_jax.G2, parts)


# -- distributed NTT (four-step) --------------------------------------------

def _four_step_twiddles(log_n: int, d: int, inverse: bool) -> np.ndarray:
    """(D, L, 16) mont twiddles w_n^(j1*k2) for the middle step."""
    n = 1 << log_n
    l = n // d
    w = ntt_mod.domain_root(log_n)
    if inverse:
        w = pow(w, FR.p - 2, FR.p)
    rows = []
    for j1 in range(d):
        base = pow(w, j1, FR.p)
        row = [1] * l
        for k2 in range(1, l):
            row[k2] = row[k2 - 1] * base % FR.p
        rows.append(row)
    flat = [v for row in rows for v in row]
    return FR.to_mont_host(flat).reshape(d, l, L.N_LIMBS)


def _dft_matrix(d: int, inverse: bool) -> np.ndarray:
    """(D, D, 16) mont matrix w_D^(j1*k1) for the cross-chip step."""
    assert d & (d - 1) == 0, "device count must be a power of two"
    w = ntt_mod.domain_root(d.bit_length() - 1)
    if inverse:
        w = pow(w, FR.p - 2, FR.p)
    vals = [pow(w, (j * k) % d, FR.p) for j in range(d) for k in range(d)]
    return FR.to_mont_host(vals).reshape(d, d, L.N_LIMBS)


@lru_cache(maxsize=16)
def _sharded_ntt_fn(mesh: Mesh, log_n: int, inverse: bool):
    """Cached jitted four-step NTT program for (mesh, log_n, inverse)."""
    axis = mesh.axis_names[0]
    d = mesh.devices.size
    n = 1 << log_n
    l = n // d
    tw = jnp.asarray(_four_step_twiddles(log_n, d, inverse))
    dft = jnp.asarray(_dft_matrix(d, inverse))
    n_inv_mont = jnp.asarray(FR.to_mont_host([pow(n, FR.p - 2, FR.p)]))[0]

    @jax.jit
    @partial(shard_map, mesh=mesh, check_rep=False, in_specs=(P(axis), P(axis)),
             out_specs=P(axis))
    def run(chunk, tw_row):
        # chunk: (1, L, 16) — this device's residue class row
        row = chunk[0]
        a = ntt_mod.ntt_mont(row, inverse=inverse)   # local NTT_L
        if inverse:
            # local intt scales by 1/L; total needs 1/n: undo and rescale
            l_mont = jnp.asarray(FR.to_mont_host([l]))[0]
            a = FR.mont_mul(a, l_mont)
        a = FR.mont_mul(a, tw_row[0])                # middle twiddle
        rows = jax.lax.all_gather(a, axis)           # (D, L, 16)
        k1 = jax.lax.axis_index(axis)
        coeffs = dft[:, k1]                          # (D, 16): w_D^(j1*k1)
        terms = FR.mont_mul(rows, coeffs[:, None, :])
        # log-depth fold over the D gathered rows
        m = terms.shape[0]
        while m > 1:
            half = m // 2
            terms = FR.add(terms[:half], terms[half:m])
            m = half
        out = terms[0]
        if inverse:
            out = FR.mont_mul(out, n_inv_mont)
        return out[None]

    return lambda x_cyclic: run(x_cyclic, tw)


def sharded_ntt(mesh: Mesh, x_cyclic: jnp.ndarray, log_n: int,
                inverse: bool = False) -> jnp.ndarray:
    """Distributed NTT over n = 2^log_n Montgomery-form elements.

    Input layout: x_cyclic is (D, L, 16) where row j1 holds the cyclic
    residue class x[j1 + D*j2] (j2 = 0..L-1). Output: (D, L, 16) where row
    k1 holds the contiguous block X[k1*L + k2] — i.e. cyclic in, blocked
    out (the standard four-step layout exchange).
    """
    return _sharded_ntt_fn(mesh, log_n, bool(inverse))(x_cyclic)


def cyclic_shard(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """(n, 16) -> (D, n/D, 16) residue-class rows for sharded_ntt."""
    n = x.shape[0]
    return x.reshape(n // d, d, L.N_LIMBS).transpose(1, 0, 2)


def unblock(x_blocked: jnp.ndarray) -> jnp.ndarray:
    """(D, L, 16) contiguous blocks -> (n, 16) natural order."""
    d, l, _ = x_blocked.shape
    return x_blocked.reshape(d * l, L.N_LIMBS)


def block_shard(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """(n, 16) -> (D, n/D, 16) contiguous blocks (inverse of unblock)."""
    n = x.shape[0]
    return x.reshape(d, n // d, L.N_LIMBS)


@lru_cache(maxsize=16)
def _blocked_to_cyclic_fn(mesh: Mesh):
    axis = mesh.axis_names[0]
    d = mesh.devices.size

    @jax.jit
    @partial(shard_map, mesh=mesh, check_rep=False, in_specs=P(axis),
             out_specs=P(axis))
    def run(chunk):
        row = chunk[0]                                # (L, 16)
        l = row.shape[0]
        assert l % d == 0, "L must divide by device count"
        t_cnt = l // d
        k1 = jax.lax.axis_index(axis)
        r_ids = jnp.arange(d, dtype=jnp.int32)
        # send-side gather: S[r, t] = row[((r - k1*L) mod D) + D*t]
        k2_0 = jnp.mod(r_ids - k1 * l, d)             # (D,)
        send_idx = k2_0[:, None] + d * jnp.arange(t_cnt, dtype=jnp.int32)
        s = jnp.take(row, send_idx.reshape(-1), axis=0)
        s = s.reshape(d, t_cnt, L.N_LIMBS)
        # piece r -> device r; received R[j1] = S_{j1}[r]
        recv = jax.lax.all_to_all(s, axis, split_axis=0, concat_axis=0,
                                  tiled=False)
        r = jax.lax.axis_index(axis)
        # receive-side placement: row j1 occupies cyclic slots
        # [base(j1), base(j1) + L/D), base = (j1*L + ((r - j1*L) mod D) - r)/D
        j1 = jnp.arange(d, dtype=jnp.int32)
        base = (j1 * l + jnp.mod(r - j1 * l, d) - r) // d
        out_idx = (base[:, None]
                   + jnp.arange(t_cnt, dtype=jnp.int32)[None, :]).reshape(-1)
        out = jnp.zeros((l, L.N_LIMBS), jnp.uint32)
        out = out.at[out_idx].set(recv.reshape(-1, L.N_LIMBS))
        return out[None]

    return run


def blocked_to_cyclic(mesh: Mesh, x_blocked: jnp.ndarray) -> jnp.ndarray:
    """Relayout (D, L, 16) contiguous blocks -> (D, L, 16) cyclic residue
    rows with ONE tiled all_to_all — the sequence-parallel index exchange
    (SURVEY §2.5 SP row: Ulysses-style shuffle, not ring).

    Device k1 holds X[k1*L + k2]; device r must end with X[r + D*j].
    k1's elements for r are k2 = ((r - k1*L) mod D) + D*t, t = 0..L/D-1,
    and they land contiguously at cyclic slots t + base where
    base = (k1*L + ((r - k1*L) mod D) - r) / D.
    """
    return _blocked_to_cyclic_fn(mesh)(x_blocked)


# -- fully distributed quotient + proof-point pipeline ------------------------

def _coset_powers_blocked(log_n: int, d: int, inverse: bool) -> np.ndarray:
    """(D, L, 16) mont coset powers g^i in blocked (natural-index) layout."""
    n = 1 << log_n
    g = pow(ntt_mod.COSET_SHIFT, FR.p - 2, FR.p) if inverse \
        else ntt_mod.COSET_SHIFT
    pw = [1] * n
    for i in range(1, n):
        pw[i] = pw[i - 1] * g % FR.p
    return FR.to_mont_host(pw).reshape(d, n // d, L.N_LIMBS)


def sharded_quotient(mesh: Mesh, a_cyc, b_cyc, c_cyc, zinv_mont, log_m: int):
    """Distributed h = (A*B - C)/Z over the coset, all layouts sharded:

        iNTT (4-step, all_gather)  -> blocked coeffs
        coset scale (local)        -> blocked
        relayout (all_to_all)      -> cyclic
        NTT                        -> blocked coset evals
        pointwise (local)          -> blocked
        relayout + iNTT + inverse coset scale -> blocked h coeffs

    Inputs are (D, L, 16) cyclic Montgomery-form domain evaluations; output
    is (D, L, 16) blocked PLAIN-form h coefficients (MSM scalar layout).
    """
    d = mesh.devices.size
    cs_f = jnp.asarray(_coset_powers_blocked(log_m, d, False))
    cs_i = jnp.asarray(_coset_powers_blocked(log_m, d, True))

    def to_coset_evals(x_cyc):
        coeffs = sharded_ntt(mesh, x_cyc, log_m, inverse=True)
        scaled = FR.mont_mul(coeffs, cs_f)     # blocked, local
        return sharded_ntt(mesh, blocked_to_cyclic(mesh, scaled), log_m)

    ca = to_coset_evals(a_cyc)
    cb = to_coset_evals(b_cyc)
    cc = to_coset_evals(c_cyc)
    h_cos = FR.mont_mul(FR.sub(FR.mont_mul(ca, cb), cc), zinv_mont)
    h_coeffs = sharded_ntt(mesh, blocked_to_cyclic(mesh, h_cos), log_m,
                           inverse=True)
    h = FR.mont_mul(h_coeffs, cs_i)
    return FR.from_mont(h)


def submeshes(mesh: Mesh, n_groups: int):
    """Split a 1-D mesh into n_groups disjoint sub-meshes (same axis
    name). The EP/PP axis: heterogeneous MSM tables scheduled to disjoint
    chip groups, dispatched asynchronously so their programs overlap
    (SURVEY §2.5 EP row: 'heterogeneous MSM tables assigned to disjoint
    chip groups')."""
    devs = mesh.devices.reshape(-1)
    assert len(devs) % n_groups == 0, "device count must split evenly"
    per = len(devs) // n_groups
    return [Mesh(devs[i * per:(i + 1) * per], mesh.axis_names)
            for i in range(n_groups)]


def distributed_prove_core(mesh: Mesh, a_cyc, b_cyc, c_cyc, zinv_mont,
                           log_m: int, g1_tables, g2_table, c=8,
                           table_groups: int = 1):
    """One full distributed Groth16 compute step (the multi-chip training
    step analog): sharded quotient pipeline + the five sharded MSMs.

    g1_tables: dict name -> ((x, y, inf), scalars_blocked) for a/b1/c/h —
    h's scalars are the quotient output and are passed as None. Returns
    (h_blocked, dict of Jacobian results).

    table_groups > 1 splits the mesh into disjoint chip groups and
    round-robins the five MSM tables across them: each group's program is
    dispatched asynchronously (JAX dispatch is non-blocking), so table
    MSMs execute CONCURRENTLY on their groups — the pipeline/expert axis
    over the heterogeneous tables. Results are bit-identical to
    table_groups=1."""
    h = sharded_quotient(mesh, a_cyc, b_cyc, c_cyc, zinv_mont, log_m)
    if table_groups > 1:
        groups = submeshes(mesh, table_groups)
        jobs = list(g1_tables.items())
        meshes = {name: groups[i % table_groups]
                  for i, (name, _) in enumerate(jobs)}
        g2_mesh = groups[len(jobs) % table_groups]
    else:
        meshes = {name: mesh for name in g1_tables}
        g2_mesh = mesh
    results = {}
    for name, (pts, sc) in g1_tables.items():
        if sc is None:
            # h's scalars; tables may be padded BEYOND the domain (uniform
            # table sizes share one compiled MSM program) — pad with zeros
            sc_use = unblock(h)
            n_pts = pts[0].shape[0]
            if sc_use.shape[0] < n_pts:
                sc_use = jnp.concatenate(
                    [sc_use, jnp.zeros((n_pts - sc_use.shape[0], L.N_LIMBS),
                                       jnp.uint32)], axis=0)
            sc_use = sc_use[:n_pts]
        else:
            sc_use = sc

        def place(tree_like, m):
            # arrays committed to the FULL mesh (e.g. the sharded h output)
            # must be re-placed onto the group's devices
            if m is mesh:
                return tree_like
            sh = NamedSharding(m, P(m.axis_names[0]))
            return jax.tree_util.tree_map(
                lambda a: jax.device_put(a, sh), tree_like)

        gm = meshes[name]
        results[name] = sharded_msm_g1(gm, place(pts, gm),
                                       place(sc_use, gm), c=c)
    if g2_table is not None:
        pts2, sc2 = g2_table
        if g2_mesh is not mesh:
            sh = NamedSharding(g2_mesh, P(g2_mesh.axis_names[0]))
            pts2 = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, sh), pts2)
            sc2 = jax.device_put(sc2, sh)
        results["b2"] = sharded_msm_g2(g2_mesh, pts2, sc2, c=c)
    return h, results
