import sys, time
import numpy as np
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/evals")
exec(open("/tmp/msa_micro2.py").read().split("def chain")[0])
import jax
import jax.numpy as jnp

B_, T_ = counts.shape[0], counts.shape[1]
NP = ops_c.shape[1]
posT = jnp.arange(T_)[None, :]

@jax.jit
def p_opsgather(counts, ops_c, nst):
    src = posT + (NP - nst)
    op = jnp.take_along_axis(ops_c, jnp.clip(src, 0, NP-1), axis=1).astype(jnp.int32)
    return op + counts[0,0,0]*0

@jax.jit
def p_cumsums(counts, op):
    valid = (posT < 300)
    is_i = op == 1; is_d = op == 2
    cc = valid & ~is_i; cq = valid & ~is_d
    col = jnp.cumsum(cc.astype(jnp.int32), axis=1)
    qp = jnp.cumsum(cq.astype(jnp.int32), axis=1) - 1
    return col + qp + counts[0,0,0]*0

@jax.jit
def p_basegather(counts, unit, qp):
    base = jnp.take_along_axis(unit.astype(jnp.int32), jnp.clip(qp,0,unit.shape[1]-1), axis=1)
    oh = jax.nn.one_hot(base, 5, dtype=jnp.int32)
    return oh + counts[0,0,0]*0

@jax.jit
def p_countsgather(counts, colz):
    old = jnp.take_along_axis(counts, colz[:, :, None], axis=1)
    return old

@jax.jit
def p_countsgather16(counts16, colz):
    old = jnp.take_along_axis(counts16, colz[:, :, None], axis=1)
    return old

@jax.jit
def p_countsgather_planes(counts_p, colz):
    # [B,5,T] layout, gather along minor axis
    old = jnp.take_along_axis(counts_p, jnp.broadcast_to(colz[:, None, :], counts_p.shape), axis=2)
    return old

op0 = np.random.randint(0,3,(B_,T_)).astype(np.int32)
op0 = jnp.asarray(op0)
colz = jnp.asarray(np.sort(np.random.randint(0,T_,(B_,T_)),axis=1).astype(np.int32))
counts16 = counts.astype(jnp.int16)
counts_p = jnp.transpose(counts, (0,2,1))
qp = jnp.asarray(np.clip(np.sort(np.random.randint(0,T_,(B_,T_)),axis=1),0,T_-1).astype(np.int32))

def slope(name, fn, args, N1=2, N2=10, reps=3):
    def run(N):
        ts=[]
        for _ in range(reps+1):
            t0=time.perf_counter()
            x = args
            out = None
            for _ in range(N):
                out = fn(*x)
            np.asarray(jax.device_get(out.ravel()[:1]))
            ts.append(time.perf_counter()-t0)
        return min(ts[1:])
    # chain via re-feeding? independent calls suffice if device executes all
    t1, t2 = run(N1), run(N2)
    print(f"{name}: {(t2-t1)/(N2-N1)*1e3:.2f} ms/call (N2={t1*1e3:.1f} N10={t2*1e3:.1f})")

slope("opsgather [B,T]<-[B,NL]", p_opsgather, (counts, ops_c, nst))
slope("cumsums", p_cumsums, (counts, op0))
slope("basegather+onehot", p_basegather, (counts, unit_k, qp))
slope("countsgather [B,T,5] ax1", p_countsgather, (counts, colz))
slope("countsgather int16", p_countsgather16, (counts16, colz))
slope("countsgather [B,5,T] ax2", p_countsgather_planes, (counts_p, colz))
