"""Pallas TPU wavefront kernel for the batched affine-gap DP.

Same recurrence and tie-break semantics as ops/ksw2.py (the reference's
ksw2/ksw2_extz2_sse.c evaluated exactly), but the whole anti-diagonal loop
runs inside one Mosaic kernel: grid over rows, DP state ([B, T] int32 lanes)
lives in VMEM scratch that persists across sequential grid steps, and the
per-row direction bytes stream to HBM for the backtrack pass.

Key layout trick: the row-r query slice q[r-t] is a contiguous window of the
reversed, left-padded query buffer at offset (LQ+LT-2-r) — one pl.ds dynamic
slice per row instead of a per-lane gather (TPUs have no fast VPU gather).

The backtrack (cigar walk computing iden_n and the backtrack_left_end
projection) stays in XLA as a vmapped while_loop over the dirs tensor —
it is O(LQ+LT) scalar-ish work per problem, negligible next to the DP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ksw2 import GAP_EXT, GAP_OPEN, MATCH_SC, MAX_SC, MIS_SC, QE, QE2, SC_N
from .ksw2_jax import _backtrack_one

NEG_INF32 = -(1 << 30)


def _kernel(
    qbuf_ref,   # [B, LQ+2LT] int32: reversed query at offset LT-1, pad 4
    tgt_ref,    # [B, T] int32
    qlen_ref,   # [B, 1] int32
    tlen_ref,   # [B, 1] int32
    dirs_ref,   # out: [1, B, T] uint8 (this row's direction bytes)
    best_ref,   # out: [B, 4] int32 (max, max_t, max_q, score)
    u_ref, v_ref, x_ref, y_ref, h_ref, qrr_ref,  # scratch [B, T] int32
    *,
    T: int,
    LQ: int,
    LT: int,
    with_dirs: bool,
    scores: tuple = (MATCH_SC, MIS_SC, GAP_OPEN, GAP_EXT),
):
    MATCH, MIS, GO, GE = scores
    SCN = -GE
    QE_ = GO + GE
    QE2_ = 2 * QE_
    MAXSC = MATCH + QE2_
    r = pl.program_id(0)
    B = tgt_ref.shape[0]
    qlen = qlen_ref[:, 0:1]
    tlen = tlen_ref[:, 0:1]

    @pl.when(r == 0)
    def _init():
        u_ref[:] = jnp.zeros((B, T), jnp.int32)
        v_ref[:] = jnp.zeros((B, T), jnp.int32)
        x_ref[:] = jnp.zeros((B, T), jnp.int32)
        y_ref[:] = jnp.zeros((B, T), jnp.int32)
        h_ref[:] = jnp.full((B, T), NEG_INF32, jnp.int32)
        qrr_ref[:] = jnp.full((B, T), 4, jnp.int32)
        best_ref[:] = jnp.zeros((B, 4), jnp.int32)
        best_ref[:, 1] = jnp.full((B,), -1, jnp.int32)
        best_ref[:, 2] = jnp.full((B,), -1, jnp.int32)
        best_ref[:, 3] = jnp.full((B,), NEG_INF32, jnp.int32)

    ti = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    st0 = jnp.maximum(0, r - qlen + 1)          # [B, 1]
    en0 = jnp.minimum(tlen - 1, r)              # [B, 1]
    n_rows = qlen + tlen - 1
    active = r < n_rows                          # [B, 1]

    # q[r - t]: maintain the diagonal query window in scratch — shift right
    # by one lane per row and insert q[b, r] at t=0. The insert value comes
    # from a 128-aligned load + one-hot extract (no per-lane gather needed).
    r_al = pl.multiple_of(r // 128 * 128, 128)
    qwin = qbuf_ref[:, pl.ds(r_al, 128)]               # [B, 128]
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
    q_r = jnp.sum(
        jnp.where(lane128 == (r - r_al), qwin, 0), axis=1, keepdims=True
    )                                                   # [B, 1] = q[b, r]
    qb = jnp.where(ti == 0, q_r, pltpu.roll(qrr_ref[:], 1, 1))
    qrr_ref[:] = qb
    tb = tgt_ref[:]
    is_n = (tb == 4) | (qb == 4)
    s = jnp.where(is_n, SCN, jnp.where(tb == qb, MATCH, MIS))

    bq = jnp.where(r > 0, GO, 0).astype(jnp.int32)
    u_p = u_ref[:]
    v_p = v_ref[:]
    x_p = x_ref[:]
    y_p = y_ref[:]
    is_r = ti == r
    y_b = jnp.where(is_r, 0, y_p)
    u_b = jnp.where(is_r, bq, u_p)
    x_sh = jnp.where(ti == 0, 0, pltpu.roll(x_p, 1, 1))
    v_sh = jnp.where(ti == 0, bq, pltpu.roll(v_p, 1, 1))

    a = x_sh + v_sh
    b = y_b + u_b
    z = s + QE2_
    d = (a > z).astype(jnp.int32)
    z = jnp.maximum(z, a)
    d = jnp.where(b > z, 2, d)
    z = jnp.maximum(z, b)
    z = jnp.minimum(z, MAXSC)
    u_new = z - v_sh
    v_new = z - u_b
    z2 = z - GO
    a2 = a - z2
    b2 = b - z2
    x_new = jnp.maximum(a2, 0)
    y_new = jnp.maximum(b2, 0)
    if with_dirs:
        d = d | jnp.where(a2 > 0, 0x08, 0) | jnp.where(b2 > 0, 0x10, 0)

    mask = (ti >= st0) & (ti <= en0) & active
    u_n = jnp.where(mask, u_new, u_p)
    v_n = jnp.where(mask, v_new, v_p)
    u_ref[:] = u_n
    v_ref[:] = v_n
    x_ref[:] = jnp.where(mask, x_new, x_p)
    y_ref[:] = jnp.where(mask, y_new, y_p)
    if with_dirs:
        dirs_ref[0] = jnp.where(mask, d, 0).astype(jnp.uint8)

    # H recurrence (per-problem en0 handled with one-hot reductions)
    H = h_ref[:]
    is_en0 = ti == en0
    is_en0m1 = ti == (en0 - 1)
    h_prev_en0m1 = jnp.sum(jnp.where(is_en0m1, H, 0), axis=1, keepdims=True)
    u_at_en0 = jnp.sum(jnp.where(is_en0, u_n, 0), axis=1, keepdims=True)
    h_prev_0 = H[:, 0:1]
    v_at_0 = v_n[:, 0:1]
    h_en0 = jnp.where(
        en0 > 0, h_prev_en0m1 + u_at_en0 - QE_, h_prev_0 + v_at_0 - QE_
    )
    H1 = jnp.where(mask & (ti < en0), H + v_n - QE_, H)
    H1 = jnp.where(is_en0 & active, h_en0, H1)
    H1 = jnp.where(
        (r == 0) & (ti == 0), v_n - QE_ - QE_, H1
    )
    h_ref[:] = H1

    # row max with reference SIMD tie order (see ops/ksw2.py:_row_max_scan)
    in_row = mask
    Hm = jnp.where(in_row, H1, NEG_INF32)
    M = jnp.max(Hm, axis=1, keepdims=True)
    h_at_en0 = jnp.sum(jnp.where(is_en0, H1, 0), axis=1, keepdims=True)
    en1 = st0 + (en0 - st0) // 4 * 4
    lane = (ti - st0) % 4
    BIGI = jnp.int32(1 << 20)
    SENT = jnp.int32(0x7FFFFFF)
    in_vec = (ti >= st0) & (ti < en1) & (Hm == M)
    key = jnp.where(in_vec, lane * BIGI + ti, SENT)
    vec_key = jnp.min(key, axis=1, keepdims=True)
    vec_t = vec_key % BIGI
    has_vec = vec_key != SENT
    in_rem = (ti >= en1) & (ti < en0) & (Hm == M)
    rem_key = jnp.where(in_rem, ti, SENT)
    rem_t = jnp.min(rem_key, axis=1, keepdims=True)
    has_rem = rem_key_min_valid = rem_t != SENT
    max_t = jnp.where(
        h_at_en0 == M,
        en0,
        jnp.where(has_vec, vec_t, jnp.where(has_rem, rem_t, en0)),
    )

    bmax = best_ref[:, 0:1]
    upd = active & (M > bmax)
    best_ref[:, 0:1] = jnp.where(upd, M, bmax)
    best_ref[:, 1:2] = jnp.where(upd, max_t, best_ref[:, 1:2])
    best_ref[:, 2:3] = jnp.where(upd, r - max_t, best_ref[:, 2:3])
    is_last = active & (r == n_rows - 1)
    h_at_tl = jnp.sum(
        jnp.where(ti == tlen - 1, H1, 0), axis=1, keepdims=True
    )
    best_ref[:, 3:4] = jnp.where(is_last, h_at_tl, best_ref[:, 3:4])


@functools.partial(jax.jit, static_argnames=("with_dirs", "LQ", "scores"))
def _run_pallas(qbuf, tgt, qlen, tlen, with_dirs, LQ,
                scores=(MATCH_SC, MIS_SC, GAP_OPEN, GAP_EXT)):
    B, T = tgt.shape
    LQplus = qbuf.shape[1]
    LT = T
    n_rows = LQ + LT - 1
    kern = functools.partial(
        _kernel, T=T, LQ=LQ, LT=LT, with_dirs=with_dirs, scores=scores
    )
    dirs_shape = (n_rows if with_dirs else 1, B, T)
    dirs, best = pl.pallas_call(
        kern,
        grid=(n_rows,),
        in_specs=[
            pl.BlockSpec((B, LQplus), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, T), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, B, T),
                (lambda r: (r, 0, 0)) if with_dirs else (lambda r: (0, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((B, 4), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(dirs_shape, jnp.uint8),
            jax.ShapeDtypeStruct((B, 4), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((B, T), jnp.int32) for _ in range(6)],
    )(qbuf, tgt, qlen, tlen)
    return dirs, best


def _make_qbuf(q: jnp.ndarray, LT: int) -> jnp.ndarray:
    """[B, LQ] -> int32 query padded with 4s so the kernel's 128-aligned
    window load qbuf[:, r_al : r_al+128] is in-bounds for every row r."""
    B, LQ = q.shape
    n_rows = LQ + LT - 1
    target = ((n_rows + 127) // 128) * 128 + 128
    return jnp.pad(
        q.astype(jnp.int32), ((0, 0), (0, target - LQ)), constant_values=4
    )


@functools.partial(jax.jit, static_argnames=())
def _global_post(dirs, q, qlen, t, tlen, qle):
    def one(dirs_b, qq, ql, tt, tl, qe_):
        return _backtrack_one(dirs_b, qq, tt, ql, tl, qe_)

    return jax.vmap(one, in_axes=(1, 0, 0, 0, 0, 0))(
        dirs, q.astype(jnp.int32), qlen, t.astype(jnp.int32), tlen, qle
    )


DEFAULT_SCORES = (MATCH_SC, MIS_SC, GAP_OPEN, GAP_EXT)


@functools.partial(jax.jit, static_argnames=())
def _ops_post(dirs, qlen, tlen):
    from .ksw2_jax import _backtrack_ops_one

    max_steps = dirs.shape[0] + 1

    def one(dirs_b, ql, tl):
        return _backtrack_ops_one(dirs_b, ql, tl, max_steps)

    return jax.vmap(one, in_axes=(1, 0, 0))(dirs, qlen, tlen)


def extz_score_batch(q, qlen, t, tlen, scores=DEFAULT_SCORES):
    """Pallas path of ksw2_jax.extz_score_batch: (max, max_t, max_q, score)."""
    qj = jnp.asarray(q, jnp.int32)
    tj = jnp.asarray(t, jnp.int32)
    qbuf = _make_qbuf(qj, tj.shape[1])
    _, best = _run_pallas(
        qbuf, tj, jnp.asarray(qlen, jnp.int32).reshape(-1, 1),
        jnp.asarray(tlen, jnp.int32).reshape(-1, 1), False, int(qj.shape[1]),
        tuple(scores),
    )
    return best[:, 0], best[:, 1], best[:, 2], best[:, 3]


def extz_global_batch(q, qlen, t, tlen, q_left_ext=None, scores=DEFAULT_SCORES):
    """Pallas path of ksw2_jax.extz_global_batch: (score, iden_n, t_left_ext)."""
    B = q.shape[0]
    if q_left_ext is None:
        q_left_ext = np.zeros(B, np.int32)
    qj = jnp.asarray(q, jnp.int32)
    tj = jnp.asarray(t, jnp.int32)
    qbuf = _make_qbuf(qj, tj.shape[1])
    qlenj = jnp.asarray(qlen, jnp.int32)
    tlenj = jnp.asarray(tlen, jnp.int32)
    dirs, best = _run_pallas(
        qbuf, tj, qlenj.reshape(-1, 1), tlenj.reshape(-1, 1), True,
        int(qj.shape[1]), tuple(scores),
    )
    iden, tleft = _global_post(
        dirs, qj, qlenj, tj, tlenj, jnp.asarray(q_left_ext, jnp.int32)
    )
    return best[:, 3], iden, tleft  # JAX arrays (async); caller syncs


def extz_ops_batch(q, qlen, t, tlen, scores=DEFAULT_SCORES):
    """Pallas path of ksw2_jax.extz_ops_batch: (score, ops, n_steps)."""
    qj = jnp.asarray(q, jnp.int32)
    tj = jnp.asarray(t, jnp.int32)
    qbuf = _make_qbuf(qj, tj.shape[1])
    qlenj = jnp.asarray(qlen, jnp.int32)
    tlenj = jnp.asarray(tlen, jnp.int32)
    dirs, best = _run_pallas(
        qbuf, tj, qlenj.reshape(-1, 1), tlenj.reshape(-1, 1), True,
        int(qj.shape[1]), tuple(scores),
    )
    ops, n = _ops_post(dirs, qlenj, tlenj)
    return best[:, 3], ops, n  # JAX arrays (async); caller syncs
