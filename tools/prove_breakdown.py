"""Per-stage wall-clock breakdown of the device prove pipeline at (2,6).

Runs each prove() stage with an explicit block_until_ready barrier (the
real pipeline overlaps G2 with the G1 host combine, so per-stage numbers
here OVERSTATE the end-to-end total) and then times two full prove()
calls. Uses the cached e2e proving key (tests/.keys_cache) — run
tests/test_e2e_rollup.py once first if it is missing.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zkrollup.config import RollupConfig
from zkrollup.ref import eddsa
from zkrollup.chain.simulator import RollUpContract
from zkrollup.operator.state import OperatorState
from zkrollup.operator.queue import TxQueue
from zkrollup.operator.prover import TxProver
from zkrollup.operator.service import OperatorApp
from zkrollup.operator.batchd import BatchDaemon
from zkrollup.witness.assembler import Transaction, format_tx

WEI = 10 ** 18
CFG = RollupConfig()
PRIV_A = 1234567890123456789
PUB_A = eddsa.gen_public_key(PRIV_A)
PUB_B = eddsa.gen_public_key(9876543210987654321)

prover = TxProver(CFG, key_path="tests/.keys_cache/tx_2_6.npz",
                  setup_seed=b"e2e")
pk = prover.ensure_keys()
contract = RollUpContract(CFG, tx_vk=None, withdraw_vk=None)
state = OperatorState(CFG)
queue = TxQueue()
app = OperatorApp(CFG, state, queue, contract,
                  BatchDaemon(CFG, state, queue, prover, contract))
contract.deposit(PUB_A[0], PUB_A[1], WEI)
contract.deposit(PUB_B[0], PUB_B[1], WEI)
app.sync_chain()


def send(priv, frm, to, amount, fee, nonce):
    tx = Transaction(frm, to, amount, fee, nonce)
    tx.signature = eddsa.sign(priv, format_tx(tx))
    app.post_send({
        "from": frm, "to": to, "amount": str(amount), "fee": str(fee),
        "nonce": nonce,
        "signature": {"R8": [str(tx.signature.R8[0]),
                             str(tx.signature.R8[1])],
                      "S": str(tx.signature.S)}})


send(PRIV_A, 0, 1, WEI // 10, WEI // 100, 1)
send(PRIV_A, 0, 1, 3 * WEI // 10, 2 * WEI // 100, 2)
prep = prover.prepare_batch(state.load_tree(),
                            queue.peek_batch(CFG.batch_size))
witness = prep.witness

import zkrollup.groth16.prove  # noqa: F401
PM = sys.modules["zkrollup.groth16.prove"]
from zkrollup.groth16.prove import (_abc_evals, _quotient_plain,
                                    _device_pack_g1, _device_pack_g2,
                                    _scalars_cat, _segsum_scalars,
                                    MSM_WINDOW)
from zkrollup.fields.mont import FR
from zkrollup.fields import limbs as L
from zkrollup.groth16.qap import to_coo
from zkrollup.ntt.ntt import COSET_SHIFT
from zkrollup.msm.msm import _multi_window_sums_jit, _window_sums_jit, \
    _clamp_window
from zkrollup.msm.glv import combine_window_sums_host, \
    combine_window_sums_host_g2
from zkrollup.curve import g1_jax, g2_jax
from zkrollup.ref.bn254 import R as FR_MOD

r1cs = prover._structure_r1cs()
coo = to_coo(r1cs)
m = coo.m


def tstage(label, fn, n=2):
    best = None
    out = None
    for _ in range(n):
        t0 = time.time()
        out = jax.block_until_ready(fn())
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:34s} {best*1000:9.1f} ms", flush=True)
    return out


wits = [w % FR_MOD for w in witness]
w_plain = tstage("ints_to_limbs",
                 lambda: jnp.asarray(L.ints_to_limbs(wits)))
w_mont = tstage("to_mont", lambda: FR.to_mont(w_plain))
coo_dev = ((jnp.asarray(coo.a_row), jnp.asarray(coo.a_var),
            jnp.asarray(coo.a_coeff)),
           (jnp.asarray(coo.b_row), jnp.asarray(coo.b_var),
            jnp.asarray(coo.b_coeff)),
           (jnp.asarray(coo.c_row), jnp.asarray(coo.c_var),
            jnp.asarray(coo.c_coeff)))
abc = tstage("abc_evals (spmv x3)",
             lambda: _abc_evals(coo_dev, w_mont, m))
a_e, b_e, c_e = abc
z_coset = (pow(COSET_SHIFT, m, FR_MOD) - 1) % FR_MOD
zinv = FR.const_mont(pow(z_coset, -1, FR_MOD))
h_plain = tstage("quotient (7 NTTs)",
                 lambda: _quotient_plain(a_e, b_e, c_e, zinv))

t0 = time.time()
pack = _device_pack_g1(pk)
print(f"{'device_pack_g1 (cached after 1st)':34s} "
      f"{(time.time()-t0)*1000:9.1f} ms", flush=True)
sc_cat = tstage("scalars_cat (segsum)",
                lambda: _scalars_cat(w_plain, h_plain, pack["idx"],
                                     pack["seg"], pack["n_seg"],
                                     pack["bounds"], pack["N"]))
n_pts = sum(l for _, l in pack["bounds"])
print(f"  fused G1 points: {n_pts}", flush=True)
c1 = _clamp_window(MSM_WINDOW, max(l for _, l in pack["bounds"]))
wsum1 = tstage("fused G1 window sums",
               lambda: _multi_window_sums_jit(g1_jax.G1)(
                   tuple(pack["points"]), sc_cat, c=c1,
                   bounds=pack["bounds"], distinct=True))[0]

g2p = _device_pack_g2(pk)
sc2 = tstage("g2 scalars segsum",
             lambda: jax.jit(_segsum_scalars, static_argnames=("n_seg",))(
                 w_plain[g2p["idx"]], g2p["seg"], n_seg=g2p["n_seg"]))
c2 = _clamp_window(min(MSM_WINDOW, 12), int(sc2.shape[0]))
print(f"  g2 points: {int(sc2.shape[0])}", flush=True)
wsum2 = tstage("G2 window sums",
               lambda: _window_sums_jit(g2_jax.G2)(
                   tuple(g2p["points"]), sc2, c=c2, n_bits=256,
                   distinct=True))[0]

tmap = jax.tree_util.tree_map
t0 = time.time()
parts = [combine_window_sums_host(tmap(lambda a: a[:, t], wsum1), c1)
         for t in range(4)]
print(f"{'G1 host combines x4':34s} {(time.time()-t0)*1000:9.1f} ms",
      flush=True)
t0 = time.time()
combine_window_sums_host_g2(wsum2, c2)
print(f"{'G2 host combine':34s} {(time.time()-t0)*1000:9.1f} ms",
      flush=True)

for i in range(3):
    t0 = time.time()
    proof = PM.prove(pk, r1cs, witness, r=7, s=11)
    print(f"full prove() #{i}: {time.time()-t0:.2f} s", flush=True)
