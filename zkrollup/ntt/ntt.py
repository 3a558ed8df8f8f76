"""Radix-2 NTT / iNTT over BN254 Fr, batched limb arithmetic on TPU.

Replaces websnark's WASM FFT (the `domainSize`-sized transform the Groth16
prover runs to get the quotient polynomial h(x); SURVEY §2.4 row 1,
§3.3 "iFFT/FFT -> h coeffs"). Design is TPU-first:

  - iterative Cooley-Tukey with a host-precomputed bit-reversal gather and
    per-stage twiddle tables in Montgomery form
  - each stage is one batched butterfly over the whole (n, 16) limb array:
    a gather-free reshape into (pairs, 2, 16), one mont_mul for v*w, one
    add/sub — pure VPU work, no data-dependent control flow
  - Fr has 2-adicity 28 (r - 1 = 2^28 * odd), domains up to 2^28

Coset evaluation (for h = (AB - C)/Z on a coset) uses the multiplicative
shift g = 5 applied as a per-index power ladder.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.mont import FR
from ..fields import limbs as L

TWO_ADICITY = 28
# multiplicative generator of Fr* (5 generates; its (r-1)/2^28 power has
# exact order 2^28 — asserted in tests)
GENERATOR = 5
ROOT_OF_UNITY = pow(GENERATOR, (FR.p - 1) >> TWO_ADICITY, FR.p)
COSET_SHIFT = GENERATOR


@lru_cache(maxsize=None)
def domain_root(log_n: int) -> int:
    assert log_n <= TWO_ADICITY
    return pow(ROOT_OF_UNITY, 1 << (TWO_ADICITY - log_n), FR.p)


@lru_cache(maxsize=None)
def _bit_rev_perm(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@lru_cache(maxsize=None)
def _stage_twiddles(log_n: int, inverse: bool) -> tuple:
    """Per-stage twiddle tables (mont form, host numpy), stage m = 1..n/2."""
    w_n = domain_root(log_n)
    if inverse:
        w_n = pow(w_n, FR.p - 2, FR.p)
    tables = []
    for s in range(log_n):
        m = 1 << s  # half-size of butterfly group at this stage
        w_m = pow(w_n, 1 << (log_n - 1 - s), FR.p)
        tw = [1] * m
        for j in range(1, m):
            tw[j] = tw[j - 1] * w_m % FR.p
        tables.append(FR.to_mont_host(tw))
    return tuple(tables)


def ntt_mont(a: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """In-order -> in-order transform. a: (n, 16) Montgomery-form coeffs.

    Forward: evaluations over the size-n subgroup in index order w^0..w^{n-1}.
    Inverse: interpolation (includes the 1/n scaling).
    """
    n = a.shape[0]
    log_n = int(n).bit_length() - 1
    assert 1 << log_n == n, "domain must be a power of two"

    perm = jnp.asarray(_bit_rev_perm(log_n))
    x = jnp.take(a, perm, axis=0)
    tables = _stage_twiddles(log_n, inverse)

    from ..fields import pallas_mont
    fuse = pallas_mont.butterfly_should_use(n // 2)
    for s in range(log_n):
        m = 1 << s
        tw = jnp.asarray(tables[s])                     # (m, 16)
        grp = x.reshape(n // (2 * m), 2, m, L.N_LIMBS)
        u = grp[:, 0].reshape(n // 2, L.N_LIMBS)
        b = grp[:, 1].reshape(n // 2, L.N_LIMBS)
        twf = jnp.broadcast_to(
            tw[None], (n // (2 * m), m, L.N_LIMBS)).reshape(n // 2,
                                                            L.N_LIMBS)
        if fuse:
            # one fused VMEM kernel: v = b*tw; (u+v, u-v)
            hi, lo = pallas_mont.butterfly(FR, u, b, twf)
        else:
            v = FR.mont_mul(b, twf)
            hi, lo = FR.add(u, v), FR.sub(u, v)
        x = jnp.stack(
            [hi.reshape(n // (2 * m), m, L.N_LIMBS),
             lo.reshape(n // (2 * m), m, L.N_LIMBS)],
            axis=1).reshape(n, L.N_LIMBS)

    if inverse:
        n_inv = pow(n, FR.p - 2, FR.p)
        x = FR.mont_mul(x, jnp.asarray(FR.to_mont_host([n_inv]))[0])
    return x


def intt_mont(a: jnp.ndarray) -> jnp.ndarray:
    return ntt_mont(a, inverse=True)


@lru_cache(maxsize=None)
def _coset_powers(log_n: int, inverse: bool) -> np.ndarray:
    n = 1 << log_n
    g = pow(COSET_SHIFT, FR.p - 2, FR.p) if inverse else COSET_SHIFT
    pw = [1] * n
    for i in range(1, n):
        pw[i] = pw[i - 1] * g % FR.p
    return FR.to_mont_host(pw)


def coset_scale_mont(a: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Multiply coeff i by g^i (or g^-i): maps subgroup evals <-> coset evals
    when composed with ntt/intt."""
    n = a.shape[0]
    log_n = int(n).bit_length() - 1
    return FR.mont_mul(a, jnp.asarray(_coset_powers(log_n, inverse)))


def coset_ntt_mont(coeffs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate polynomial on the coset g*H."""
    return ntt_mont(coset_scale_mont(coeffs))


def coset_intt_mont(evals: jnp.ndarray) -> jnp.ndarray:
    """Interpolate from evaluations on g*H back to coefficients."""
    return coset_scale_mont(intt_mont(evals), inverse=True)


# -- host-int convenience (tests / small inputs) ----------------------------

def ntt_ints(xs, inverse: bool = False):
    a = jnp.asarray(FR.to_mont_host(list(xs)))
    return FR.from_mont_host(np.asarray(ntt_mont(a, inverse=inverse)))
