import sys, time
import numpy as np
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/evals")
exec(open("/tmp/msa_micro2.py").read().split("def chain")[0])
import jax, functools
import jax.numpy as jnp

@jax.jit
def dp_dep(qbuf, prev_dirs):
    return qbuf + (prev_dirs[0, 0, :1] * 0).astype(qbuf.dtype)

@jax.jit
def bt_dep(dirs, prev_ops):
    return dirs.at[0,0,0].set(dirs[0,0,0] | (prev_ops[0,0]*0).astype(dirs.dtype))

@jax.jit
def sc_dep(counts, prev_sub):
    return counts + (prev_sub[0,0,:1]*0).astype(counts.dtype)[None,None,:]*0 + (prev_sub[0,0,0]*0)

def slope(name, step, N1=2, N2=10, reps=3):
    def run(N):
        ts=[]
        for _ in range(reps+1):
            t0=time.perf_counter(); out = step(N)
            np.asarray(jax.device_get(out.ravel()[:1] if hasattr(out,'ravel') else out))
            ts.append(time.perf_counter()-t0)
        return min(ts[1:])
    t1, t2 = run(N1), run(N2)
    print(f"{name}: {(t2-t1)/(N2-N1)*1e3:.2f} ms/call  (N{N1}={t1*1e3:.1f}ms N{N2}={t2*1e3:.1f}ms)")

def dp_chain(N):
    qb = qbuf; d = dirs
    for _ in range(N):
        d = run_dp(maxr, qb, sub, wl, wdel, wl2, wdel2, q1, n1)
        qb = dp_dep(qbuf, d)
    return d[0,0,:1]

def bt_chain(N):
    dd = dirs; o = ops_c
    for _ in range(N):
        o, ns, tc = run_bt(dd, q1, n1)
        dd = bt_dep(dirs, o)
    return o[0,:1]

def sc_chain(N):
    c = counts; s = sub
    for _ in range(N):
        c2 = sc_dep(counts, s)
        s, _wd, _wlx, _wd2, _wl2x, _qb = msa.scores_step(c2, n_placed, ncol, unit_k, lqplus=LQplus)
    return s[0,0,:1]

def up_chain(N):
    c = counts; np_, nc, ov = n_placed, ncol, overflow
    for _ in range(N):
        c, np_, nc, ov = msa.update_step(c, np_, nc, ov, unit_k, qlen_k, active, ops_c, nst)
    return c[0,0,:1]

def round_chain(N):
    st = (counts, n_placed, ncol, overflow, ev)
    for _ in range(N):
        st = round_fn(*st, unit_k, qlen_k, active)
    return st[0][0,0,:1]

slope("dp", dp_chain)
slope("bt", bt_chain)
slope("scores", sc_chain)
slope("update", up_chain)
slope("round(fused)", round_chain)
