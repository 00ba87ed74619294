import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/evals")
from msa_micro import make_regions
import jax
import jax.numpy as jnp
from tidehunter_tpu.ops.msa_device import DeviceMSA, band_ladder
from tidehunter_tpu.params import Params

m = Params()
msa = DeviceMSA(m.match, m.mismatch, m.gap_open1, m.gap_ext1,
                gap_open2=m.gap_open2, gap_ext2=m.gap_ext2)
regions = make_regions(256)
T, W = 640, 128
round_fn, polish_round_fn, B, LQplus, NL = msa._round(T, W)
run_dp, Bd, _ = msa._dp_run(T, W)
run_bt, _, _ = msa._bt_run(T, W)
U = max(len(u) for u in regions)
units_arr = np.full((B, U, T), 4, np.uint8)
ulen = np.zeros((B, U), np.int32)
nunits = np.ones(B, np.int32)
for i, units in enumerate(regions[:B]):
    nunits[i] = len(units)
    for k, u in enumerate(units):
        L = min(len(u), T)
        units_arr[i, k, :L] = u[:L]
        ulen[i, k] = max(1, L)
units_dev = jnp.asarray(units_arr); ulen_dev = jnp.asarray(ulen)
nunits_dev = jnp.asarray(nunits)
counts, ncol = msa.init_step(units_dev, ulen_dev)
n_placed = jnp.ones(B, jnp.int32); overflow = jnp.zeros(B, bool)
ev = jnp.zeros(B, jnp.int32)
unit_k, qlen_k, active = msa.gather_step(units_dev, ulen_dev, nunits_dev, jnp.asarray(3))
sub, wdel, wl, wdel2, wl2, qbuf = msa.scores_step(counts, n_placed, ncol, unit_k, lqplus=LQplus)
maxr = jnp.max(qlen_k + ncol).reshape(1, 1)
q1 = qlen_k.reshape(-1,1); n1 = ncol.reshape(-1,1)
dirs = run_dp(maxr, qbuf, sub, wl, wdel, wl2, wdel2, q1, n1)
ops_c, nst, tchk = run_bt(dirs, q1, n1)

def chain(name, fn, n=8, reps=3):
    for _ in range(2):
        outs = [fn() for _ in range(n)]
        jax.block_until_ready(outs)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(n)]
        jax.block_until_ready(outs)
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)/n*1e3:.2f} ms/call")

chain("dp", lambda: run_dp(maxr, qbuf, sub, wl, wdel, wl2, wdel2, q1, n1))
chain("bt", lambda: run_bt(dirs, q1, n1))
chain("scores", lambda: msa.scores_step(counts, n_placed, ncol, unit_k, lqplus=LQplus))
chain("update", lambda: msa.update_step(counts, n_placed, ncol, overflow, unit_k, qlen_k, active, ops_c, nst))
chain("gather", lambda: msa.gather_step(units_dev, ulen_dev, nunits_dev, jnp.asarray(3)))
chain("round", lambda: round_fn(counts, n_placed, ncol, overflow, ev, unit_k, qlen_k, active))
chain("consensus", lambda: msa.consensus_step(counts, n_placed, ncol, overflow, ev))
