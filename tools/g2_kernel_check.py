"""Differential check of the fused Pallas G2 kernels vs host ground truth.

Runs each kernel ONCE in eager interpret mode over a mixed-case batch
(generic adds, P+P, P+(-P), infinities, non-unit Z). Standalone because
eager interpret is ~5x slower inside a pytest process; the slow tier
drives this via subprocess (tests/test_pallas_curve_g2.py).

Prints G2KERNELS OK on success.
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from zkrollup.curve import g2_jax, pallas_curve_g2  # noqa: E402
from zkrollup.ref import bn254 as ref  # noqa: E402


def pts(ks):
    return [None if k is None else ref.g2_mul(ref.G2_GEN, k) for k in ks]


def jac(ps):
    return g2_jax.pack_jacobian_host(ps)


def unpack(p):
    return g2_jax.to_affine_host(p)


def expected(pa, qa):
    return [ref.g2_add(a, b) for a, b in zip(pa, qa)]


def check(name, fn, p, q, want):
    t0 = time.time()
    got = unpack(fn.__wrapped__(p, q) if q is not None
                 else fn.__wrapped__(p))
    assert got == want, f"{name}: mismatch\n got={got}\nwant={want}"
    print(f"{name}: ok ({time.time() - t0:.1f}s)", flush=True)


def main():
    # interpret mode COMPILES each kernel body (~4 min for the big Fq2
    # kernels at -O1, measured round 5): "quick" covers the kernel the MSM
    # scan drives hot (madd_nd) plus the cheap double; "full" (default)
    # adds the remaining three.
    subset = os.environ.get("G2_CHECK_SUBSET", "full")

    # distinct variants: no P+P lanes; inverse + infinities stay exact
    pa2 = pts([5, 77, None, 31, 12, None])
    qa2 = pts([11, 900, 31, None, None, None])
    qa2[4] = ref.g2_neg(pa2[4])
    check("g2_madd_nd", pallas_curve_g2.g2_madd_nd, jac(pa2), jac(qa2),
          expected(pa2, qa2))

    dd = pts([5, 77, 123, None])
    got = unpack(pallas_curve_g2.g2_double.__wrapped__(jac(dd)))
    assert got == [None if a is None else ref.g2_double(a) for a in dd]
    print("g2_double: ok", flush=True)

    if subset != "quick":
        # mixed-case lanes incl. double (P+P), inverse, infinities
        p_ks = [5, 77, 123, 9, 9, 10, None, 31, None]
        q_ks = [11, 900, 124, 9, None, None, 31, None, None]
        pa, qa = pts(p_ks), pts(q_ks)
        qa[5] = ref.g2_neg(pa[5])        # P + (-P) -> infinity
        check("g2_add", pallas_curve_g2.g2_add, jac(pa), jac(qa),
              expected(pa, qa))
        check("g2_madd", pallas_curve_g2.g2_madd, jac(pa), jac(qa),
              expected(pa, qa))
        check("g2_add_nd", pallas_curve_g2.g2_add_nd, jac(pa2), jac(qa2),
              expected(pa2, qa2))
        # non-unit Z on both sides through the full add
        s1 = pallas_curve_g2.g2_add.__wrapped__(jac(pa2), jac(qa2))
        got = unpack(pallas_curve_g2.g2_add.__wrapped__(s1, s1))
        want = [ref.g2_add(v, v) for v in expected(pa2, qa2)]
        assert got == want, "non-unit-Z add mismatch"
        print("g2_add non-unit Z: ok", flush=True)
    print("G2KERNELS OK")


if __name__ == "__main__":
    main()
