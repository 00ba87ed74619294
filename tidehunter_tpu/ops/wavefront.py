"""Wavefront affine-gap DP, kernel family v2 (Pallas TPU).

Same recurrence and tie-break semantics as the NumPy oracle ops/ksw2.py
(the reference's ksw2/ksw2_extz2_sse.c evaluated exactly), engineered for
the platform's cost model: host<->device round trips cost ~25 ms each, so
one call must process an arbitrarily large batch and return only a few
words per problem.

Design rules learned from kernel v1 (ksw2_pallas, deleted round 4 — git history):

* **No cross-lane reductions inside the row loop.** Every jnp.sum/max over
  the [BT, T] lane axis costs more than the whole elementwise row update;
  v1 spent ~80% of its time in one-hot extractions and the row-max scan.
  v2 keeps the row loop purely elementwise (rolls + selects); everything
  that needs a reduction goes through full-width accumulators that XLA
  reduces once per call.
* **Batch-tiled grid** ``(NB, n_rows/K)``: one pallas_call handles any B.
* **Forward-carried backtrack annotations**: the 'global' variant carries
  (iden_n, t_left_ext) through the DP — for each cell and each backtrack
  entry state (H, E-run, F-run) it propagates the annotation of the path
  the reference backtracker (ksw2/ksw2.h:119-152, is_rot=1) would walk if
  it entered that cell in that state. The direction decisions d/bit08/bit10
  are mirrored forward instead of stored, so the O(n_rows*B*T) direction
  tensor and the backtrack pass disappear: output is [B] iden + [B] tleft.
* The 'ext' variant reproduces the exact 32-bit H row-max scan semantics
  (SIMD tie order of ksw2_extz2_sse.c:224-260) via per-lane (bestH, bestR)
  accumulators + a post-pass: bestR[t] = first row where lane t reached
  bestH[t]; the winning row r* = min bestR among bestH == max, and the
  in-row tie order (en0 first, then the 4-lane scan, then the remainder)
  is reapplied analytically for row r*.

Annotation correctness: A_s(c) = annotation of the backtrack suffix from
cell c entered in state s:
  A0(c) = d==0 ? A0(i-1,j-1)+M(c) : d==1 ? A1(i-1,j) : A2(i,j-1)+I(c)
  A1(c) = bit08(c) ? A1(i-1,j) : A0(c)      (D steps carry no annotation)
  A2(c) = bit10(c) ? A2(i,j-1)+I(c) : A0(c)
M(c) adds identity when q[j]==t[i]; the t_left projection is set by the
step consuming query index qlen-max(qle,1) (ops/ksw2.backtrack_left_end:
an M run returns t_left + q_remain — including the exhausting base's
target — while an I run returns t_left without it; qle==0 stops at the
last query-consuming step, excluding its target).  Tail cigar runs
(ksw2.h boundary pushes) enter as out-of-grid boundary values.  iden and
tleft pack into one int32 lane (iden << 14 | tleft+1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ksw2 import GAP_EXT, GAP_OPEN, MATCH_SC, MIS_SC

# CPU-interpret escape hatch: set TH_PALLAS_INTERPRET=1 (or flip this
# flag before calling) to run the kernels through the Pallas interpreter —
# lets CPU-only CI enforce the kernel-vs-oracle parity contract at small
# shapes (slow; hardware runs stay the real gate for production shapes).
import os
INTERPRET = os.environ.get("TH_PALLAS_INTERPRET", "") == "1"

NEG_INF32 = -(1 << 30)
DEFAULT_SCORES = (MATCH_SC, MIS_SC, GAP_OPEN, GAP_EXT)

TLB = 14                      # t_left field width (tl+1; 0 = unset)
TLMASK = (1 << TLB) - 1

# VMEM cell budget per tile (scratch+accumulator buffers * BT * T * 4B)
_TILE_CELLS = 64 * 1024
# per-chip fixed-batch cell budget (see fixed_b); test/dryrun harnesses
# shrink both so interpret-mode batches stay small
_FIXED_CELLS = 1_048_576


def tile_b(T: int) -> int:
    return max(8, (_TILE_CELLS // max(T, 128)) // 8 * 8)


def _roll1(arr):
    return pltpu.roll(arr, 1, 1)


def _dp_row(refs, qb, tb, r, qlen, tlen, ti, scores):
    """One wavefront row of the Suzuki-Kasahara difference recurrence.
    Purely elementwise. Returns (mask, d, bit08, bit10, u_new, v_new)."""
    MATCH, MIS, GO, GE = scores
    SCN = -GE
    QE_ = GO + GE
    QE2_ = 2 * QE_
    MAXSC = MATCH + QE2_

    u_ref, v_ref, x_ref, y_ref = refs
    st0 = jnp.maximum(0, r - qlen + 1)
    en0 = jnp.minimum(tlen - 1, r)
    active = r < qlen + tlen - 1
    mask = (ti >= st0) & (ti <= en0) & active

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
    x_sh = jnp.where(ti == 0, 0, _roll1(x_p))
    v_sh = jnp.where(ti == 0, bq, _roll1(v_p))

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
    bit08 = a2 > 0
    bit10 = b2 > 0

    u_ref[:] = jnp.where(mask, u_new, u_p)
    v_ref[:] = jnp.where(mask, v_new, v_p)
    x_ref[:] = jnp.where(mask, jnp.maximum(a2, 0), x_p)
    y_ref[:] = jnp.where(mask, jnp.maximum(b2, 0), y_p)
    return mask, d, bit08, bit10, u_new, v_new


def _qrow(qbuf_ref, qrr_ref, r, ti, B):
    """q[r-t] per lane: shift the diagonal window right by one and insert
    q[b, r] at lane 0 (128-aligned window load + one-hot extract)."""
    r_al = pl.multiple_of(r // 128 * 128, 128)
    qwin = qbuf_ref[:, pl.ds(r_al, 128)]
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
    q_r = jnp.sum(jnp.where(lane128 == (r - r_al), qwin, 0), axis=1,
                  keepdims=True)
    qb = jnp.where(ti == 0, q_r, _roll1(qrr_ref[:]))
    qrr_ref[:] = qb
    return qb


# ---------------------------------------------------------------- global --


def _global_kernel(
    maxr_ref, qbuf_ref, tgt_ref, qlen_ref, tlen_ref, qle_ref,
    acc_ref,
    u_ref, v_ref, x_ref, y_ref, qrr_ref,
    a0e_ref, a0o_ref, a1e_ref, a1o_ref, a2e_ref, a2o_ref,
    *, T: int, K: int, scores: tuple, with_tl: bool = True,
):
    rk = pl.program_id(1)
    B = tgt_ref.shape[0]
    # rows beyond the batch-wide max(qlen + tlen - 1) hold no live cells
    # (the per-problem mask is all False there); with bucket padding that
    # is ~40% of the LQ + T - 1 grid — skip their compute entirely
    maxr = maxr_ref[0, 0]
    qlen = qlen_ref[:, 0:1]
    tlen = tlen_ref[:, 0:1]
    qle = qle_ref[:, 0:1]
    ti = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    tb = tgt_ref[:]
    # the walk of backtrack_left_end returns at the step consuming query
    # index qlen-qle (M: including its target; I: excluding); qle==0 stops
    # at the LAST query-consuming step, excluding its target either way
    jS = qlen - jnp.maximum(qle, 1)
    has_q = qle > 0

    @pl.when(rk == 0)
    def _init():
        for ref in (u_ref, v_ref, x_ref, y_ref):
            ref[:] = jnp.zeros((B, T), jnp.int32)
        qrr_ref[:] = jnp.full((B, T), 4, jnp.int32)
        for ref in (a0e_ref, a0o_ref, a1e_ref, a1o_ref, a2e_ref, a2o_ref):
            ref[:] = jnp.zeros((B, T), jnp.int32)
        acc_ref[:] = jnp.zeros((B, T), jnp.int32)

    for kk in range(K):
        r = rk * K + kk

        @pl.when(r < maxr)
        def _row(r=r, kk=kk):
            _global_row(
                qbuf_ref, qrr_ref, u_ref, v_ref, x_ref, y_ref,
                a0e_ref, a0o_ref, a1e_ref, a1o_ref, a2e_ref, a2o_ref,
                acc_ref, tb, qlen, tlen, ti, jS, has_q, r, kk, B,
                scores, with_tl,
            )


def _global_row(qbuf_ref, qrr_ref, u_ref, v_ref, x_ref, y_ref,
                a0e_ref, a0o_ref, a1e_ref, a1o_ref, a2e_ref, a2o_ref,
                acc_ref, tb, qlen, tlen, ti, jS, has_q, r, kk, B,
                scores, with_tl=True):
    if True:
        qb = _qrow(qbuf_ref, qrr_ref, r, ti, B)
        mask, d, bit08, bit10, _, _ = _dp_row(
            (u_ref, v_ref, x_ref, y_ref), qb, tb, r, qlen, tlen, ti, scores
        )
        # K even => parity of r == parity of kk (static)
        if kk % 2 == 0:
            a0_ref, a1_ref, a2_ref = a0e_ref, a1e_ref, a2e_ref
            a1_other, a2_other = a1o_ref, a2o_ref
        else:
            a0_ref, a1_ref, a2_ref = a0o_ref, a1o_ref, a2o_ref
            a1_other, a2_other = a1e_ref, a2e_ref

        eq = (qb == tb).astype(jnp.int32)
        if with_tl:
            j = r - ti
            is_jS = j == jS
            # out-of-grid predecessor boundaries (tail cigar runs)
            pm_b0 = jnp.where(jS <= r - 1, (tlen + 1) & TLMASK, 0)
            pd_b0 = jnp.where(jS <= r, (tlen + 1) & TLMASK, 0)
            P_M = jnp.where(ti == r, 0,
                            jnp.where(ti == 0, pm_b0, _roll1(a0_ref[:])))
            P_D = jnp.where(ti == 0, pd_b0, _roll1(a1_other[:]))
            P_I = jnp.where(ti == r, 0, a2_other[:])

            set_m = (jnp.where(has_q, tlen - ti, tlen - 1 - ti) + 1) & TLMASK
            set_i = (jnp.where(has_q, tlen - ti - 1, tlen - 1 - ti)
                     + 1) & TLMASK
            M_step = (((P_M >> TLB) + eq) << TLB) | jnp.where(
                is_jS, set_m, P_M & TLMASK
            )
            D_step = P_D
            I_step = (P_I & ~TLMASK) | jnp.where(is_jS, set_i, P_I & TLMASK)
        else:
            # iden-only variant (run_giden — aveMatch — never reads
            # tleft): annotations carry the bare identity count, dropping
            # the field pack/unpack arithmetic.  The dominant bench
            # request class is giden at (512,512) — 70% of dispatched
            # wavefront cells (evals/hw_r05) — and the annotation side is
            # ~2/3 of the row's op count (wf_dtype_probe.py: bare DP row
            # 16.2 Gcell/s vs the full kernel's 5.5).
            P_M = jnp.where((ti == r) | (ti == 0), 0, _roll1(a0_ref[:]))
            P_D = jnp.where(ti == 0, 0, _roll1(a1_other[:]))
            P_I = jnp.where(ti == r, 0, a2_other[:])
            M_step = P_M + eq
            D_step = P_D
            I_step = P_I

        A0 = jnp.where(d == 0, M_step, jnp.where(d == 1, D_step, I_step))
        A1 = jnp.where(bit08, D_step, A0)
        A2 = jnp.where(bit10, I_step, A0)

        a0_ref[:] = jnp.where(mask, A0, a0_ref[:])
        a1_ref[:] = jnp.where(mask, A1, a1_ref[:])
        a2_ref[:] = jnp.where(mask, A2, a2_ref[:])

        # capture A0 at the final cell, elementwise; reduced in XLA
        hit = (r == qlen + tlen - 2) & (ti == tlen - 1) & mask
        acc_ref[:] = jnp.where(hit, A0, acc_ref[:])


def _unpack2(p: jnp.ndarray, L: int) -> jnp.ndarray:
    """Invert _pack2: [B, L//2] nibble-packed uint8 -> [B, L] values 0..4.
    Uploads cross a ~20-40 MB/s tunnel; bases ship 2/byte and widen
    on-device (same trick as ops/msa_device.unpack_step)."""
    lo = p & 15
    hi = p >> 4
    return jnp.stack([lo, hi], axis=-1).reshape(p.shape[0], L)


def _pack2(a: np.ndarray) -> np.ndarray:
    return a[:, 0::2] | (a[:, 1::2] << 4)


def _run_global_body(qt_pk, meta, LQ, T, K, scores, with_tl=True):
    # qt_pk: [B, (LQ+T)//2] nibble-packed q then t; meta: [B, 3] int32
    # (qlen, tlen, qle) — ONE base upload + ONE meta upload per dispatch
    # (each separate host->device array costs a tunnel round trip)
    q_u8 = _unpack2(qt_pk[:, : LQ // 2], LQ)
    tgt_u8 = _unpack2(qt_pk[:, LQ // 2:], T)
    qlen = meta[:, 0:1]
    tlen = meta[:, 1:2]
    qle = meta[:, 2:3]
    B = tgt_u8.shape[0]
    # sub-tile batches: a round with 16 rows at (2048, 128) used to pad
    # to tile_b(128)=512 rows (3% utilization — the dominant waste on
    # the test.fq workload, evals/hw_r05); BT caps at B instead
    BT = min(tile_b(T), B)
    NB = B // BT
    n_rows = LQ + T - 1
    NR = (n_rows + K - 1) // K
    kern = functools.partial(_global_kernel, T=T, K=K, scores=scores,
                             with_tl=with_tl)
    qbuf = _make_qbuf(q_u8.astype(jnp.int32), T)
    tgt = tgt_u8.astype(jnp.int32)
    LQplus = qbuf.shape[1]
    maxr = jnp.max(qlen + tlen).reshape(1, 1)
    acc = pl.pallas_call(
        kern,
        grid=(NB, NR),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, r: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BT, LQplus), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, T), lambda b, r: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 1), lambda b, r: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 1), lambda b, r: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 1), lambda b, r: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BT, T), lambda b, r: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T), jnp.int32),
        scratch_shapes=[pltpu.VMEM((BT, T), jnp.int32) for _ in range(11)],
        interpret=INTERPRET,
    )(maxr, qbuf, tgt, qlen, tlen, qle)
    packed = jnp.max(acc, axis=1)
    if not with_tl:
        return packed, jnp.zeros_like(packed)
    iden = packed >> TLB
    tl = (packed & TLMASK) - 1
    qle1 = qle[:, 0]
    tleft = jnp.where(qle1 > qlen[:, 0], tlen[:, 0], tl)
    return iden, tleft


# ------------------------------------------------------------------- ext --


def _ext_kernel(
    maxr_ref, qbuf_ref, tgt_ref, qlen_ref, tlen_ref,
    besth_ref, bestr_ref, sacc_ref,
    u_ref, v_ref, x_ref, y_ref, qrr_ref, h_ref,
    *, T: int, K: int, scores: tuple,
):
    GO, GE = scores[2], scores[3]
    QE_ = GO + GE
    rk = pl.program_id(1)
    B = tgt_ref.shape[0]
    qlen = qlen_ref[:, 0:1]
    tlen = tlen_ref[:, 0:1]
    ti = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    tb = tgt_ref[:]
    maxr = maxr_ref[0, 0]   # rows past max(qlen+tlen-1) are all dead

    @pl.when(rk == 0)
    def _init():
        for ref in (u_ref, v_ref, x_ref, y_ref):
            ref[:] = jnp.zeros((B, T), jnp.int32)
        qrr_ref[:] = jnp.full((B, T), 4, jnp.int32)
        h_ref[:] = jnp.full((B, T), NEG_INF32, jnp.int32)
        besth_ref[:] = jnp.zeros((B, T), jnp.int32)
        bestr_ref[:] = jnp.full((B, T), 0x7FFFFFF, jnp.int32)
        sacc_ref[:] = jnp.full((B, T), NEG_INF32, jnp.int32)

    for kk in range(K):
        r = rk * K + kk

        @pl.when(r < maxr)
        def _row(r=r, kk=kk):
            _ext_row(qbuf_ref, qrr_ref, u_ref, v_ref, x_ref, y_ref,
                     h_ref, besth_ref, bestr_ref, sacc_ref,
                     tb, qlen, tlen, ti, r, B, QE_, scores)


def _ext_row(qbuf_ref, qrr_ref, u_ref, v_ref, x_ref, y_ref,
             h_ref, besth_ref, bestr_ref, sacc_ref,
             tb, qlen, tlen, ti, r, B, QE_, scores):
    if True:
        qb = _qrow(qbuf_ref, qrr_ref, r, ti, B)
        mask, d, bit08, bit10, u_n, v_n = _dp_row(
            (u_ref, v_ref, x_ref, y_ref), qb, tb, r, qlen, tlen, ti, scores
        )
        en0 = jnp.minimum(tlen - 1, r)
        active = r < qlen + tlen - 1

        # 32-bit H recurrence (ksw2_extz2_sse.c:224-266), elementwise:
        # H[en0] = H_prev[en0-1] + u[en0] - QE  ==  roll(H)[en0] + u - QE
        # H[en0]@en0==0 = H_prev[0] + v[0] - QE
        # H[t<en0] += v - QE
        H = h_ref[:]
        H_sh = _roll1(H)
        h_new = jnp.where(
            ti == en0,
            jnp.where(en0 > 0, H_sh + u_n - QE_, H + v_n - QE_),
            H + v_n - QE_,
        )
        h_new = jnp.where((r == 0) & (ti == 0), v_n - QE_ - QE_, h_new)
        H1 = jnp.where(mask, h_new, H)
        h_ref[:] = H1

        # per-lane running best with first-improving row (strict >)
        bh = besth_ref[:]
        upd = mask & (H1 > bh)
        besth_ref[:] = jnp.where(upd, H1, bh)
        bestr_ref[:] = jnp.where(upd, r, bestr_ref[:])

        # final global score at (tlen-1, qlen+tlen-2)
        hit = (r == qlen + tlen - 2) & (ti == tlen - 1) & mask & active
        sacc_ref[:] = jnp.where(hit, H1, sacc_ref[:])


def _run_ext_body(qt_pk, meta, LQ, T, K, scores):
    q_u8 = _unpack2(qt_pk[:, : LQ // 2], LQ)
    tgt_u8 = _unpack2(qt_pk[:, LQ // 2:], T)
    qlen = meta[:, 0:1]
    tlen = meta[:, 1:2]
    B = tgt_u8.shape[0]
    BT = min(tile_b(T), B)   # sub-tile batches (see _run_global_body)
    NB = B // BT
    n_rows = LQ + T - 1
    NR = (n_rows + K - 1) // K
    kern = functools.partial(_ext_kernel, T=T, K=K, scores=scores)
    qbuf = _make_qbuf(q_u8.astype(jnp.int32), T)
    tgt = tgt_u8.astype(jnp.int32)
    LQplus = qbuf.shape[1]
    maxr = jnp.max(qlen + tlen).reshape(1, 1)
    out_spec = pl.BlockSpec((BT, T), lambda b, r: (b, 0),
                            memory_space=pltpu.VMEM)
    besth, bestr, sacc = pl.pallas_call(
        kern,
        grid=(NB, NR),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, r: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BT, LQplus), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, T), lambda b, r: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 1), lambda b, r: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 1), lambda b, r: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, T), jnp.int32),
            jax.ShapeDtypeStruct((B, T), jnp.int32),
            jax.ShapeDtypeStruct((B, T), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((BT, T), jnp.int32) for _ in range(6)],
        interpret=INTERPRET,
    )(maxr, qbuf, tgt, qlen, tlen)

    # post-pass: reference row-scan tie order for the winning row r*
    # (ksw2_extz2_sse.c:229-260 / ops/ksw2._row_max_scan)
    ti = jnp.arange(T)[None, :]
    qlen1 = qlen[:, 0:1]
    tlen1 = tlen[:, 0:1]
    M = jnp.max(besth, axis=1, keepdims=True)                 # [B,1]
    is_max = besth == M
    BIGSENT = jnp.int32(0x7FFFFFF)
    rstar = jnp.min(jnp.where(is_max, bestr, BIGSENT), axis=1, keepdims=True)
    st0 = jnp.maximum(0, rstar - qlen1 + 1)
    en0 = jnp.minimum(tlen1 - 1, rstar)
    en1 = st0 + (en0 - st0) // 4 * 4
    cand = is_max & (bestr == rstar)
    at_en0 = jnp.sum(jnp.where(cand & (ti == en0), 1, 0), axis=1,
                     keepdims=True) > 0
    BIGI = jnp.int32(1 << 20)
    lane = jnp.where(ti >= st0, (ti - st0) % 4, 0)
    in_vec = cand & (ti >= st0) & (ti < en1)
    vec_key = jnp.min(jnp.where(in_vec, lane * BIGI + ti, BIGSENT),
                      axis=1, keepdims=True)
    in_rem = cand & (ti >= en1) & (ti < en0)
    rem_t = jnp.min(jnp.where(in_rem, ti, BIGSENT), axis=1, keepdims=True)
    max_t = jnp.where(
        at_en0,
        en0,
        jnp.where(vec_key != BIGSENT, vec_key % BIGI,
                  jnp.where(rem_t != BIGSENT, rem_t, en0)),
    )
    found = M[:, 0] > 0
    bmax = jnp.where(found, M[:, 0], 0)
    bmax_t = jnp.where(found, max_t[:, 0], -1)
    bmax_q = jnp.where(found, rstar[:, 0] - max_t[:, 0], -1)
    score = jnp.max(sacc, axis=1)
    return bmax, bmax_t, bmax_q, score


# ------------------------------------------------------------ public API --


_run_global = functools.partial(
    jax.jit, static_argnames=("LQ", "T", "K", "scores", "with_tl")
)(_run_global_body)
_run_ext = functools.partial(jax.jit, static_argnames=("LQ", "T", "K", "scores"))(_run_ext_body)


def _mesh_n() -> int:
    from ..parallel.mesh import active_mesh_n

    return active_mesh_n()


def _mesh():
    from ..parallel.mesh import active_mesh

    return active_mesh()


@functools.lru_cache(maxsize=None)
def _sharded_global(mesh, LQ, T, K, scores, with_tl=True):
    """jit(shard_map(_run_global_body)) over the 'dp' batch axis.

    The kernel is per-row independent (the reference's pthread fan-out
    role, main.c:273-291, per SURVEY §5.8): no collectives — each chip
    runs its batch shard through its own pallas grid; results stay
    sharded and are pulled once by the caller."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    body = functools.partial(_run_global_body, LQ=LQ, T=T, K=K,
                             scores=scores, with_tl=with_tl)
    smap = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("dp"),) * 2,
        out_specs=(P("dp"), P("dp")),
        check_vma=False,
    )
    s = NamedSharding(mesh, P("dp"))
    return jax.jit(smap, in_shardings=(s,) * 2, out_shardings=(s, s))


@functools.lru_cache(maxsize=None)
def _sharded_ext(mesh, LQ, T, K, scores):
    from jax.sharding import NamedSharding, PartitionSpec as P

    body = functools.partial(_run_ext_body, LQ=LQ, T=T, K=K, scores=scores)
    smap = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("dp"),) * 2,
        out_specs=(P("dp"),) * 4,
        check_vma=False,
    )
    s = NamedSharding(mesh, P("dp"))
    return jax.jit(smap, in_shardings=(s,) * 2, out_shardings=(s,) * 4)


def _make_qbuf(q: jnp.ndarray, LT: int) -> jnp.ndarray:
    """[B, LQ] -> int32 query padded with 4s so every 128-aligned window
    load qbuf[:, r_al:r_al+128] is in-bounds."""
    B, LQ = q.shape
    n_rows = LQ + LT - 1
    target = ((n_rows + 127) // 128) * 128 + 128
    return jnp.pad(q.astype(jnp.int32), ((0, 0), (0, target - LQ)),
                   constant_values=4)


def _shape_ok(T: int, B: int) -> bool:
    """B runs at its own size iff each mesh shard is a whole number of
    grid tiles (BT = min(tile_b, shard)) — i.e. a multiple of the tile
    granularity, or a sub-tile pow2-of-8 (see sub_b)."""
    mn = _mesh_n()
    if B % (8 * mn):
        return False
    shard = B // mn
    bt = tile_b(T)
    if shard <= bt:
        return (shard & (shard - 1)) == 0 or shard % 8 == 0
    return shard % bt == 0


def fixed_b(T: int) -> int:
    """ONE batch shape per (bucket, variant): Mosaic compiles cost seconds
    on this platform and do not persist, so every call pads (or splits)
    to exactly this B. Sized for ~20-50 ms of DP per call PER CHIP (the
    kernel runs at 15-180 Gcell/s, so a mostly-padding call is still
    cheaper than one XLA shape compile); always a multiple of the mesh
    granularity tile_b(T) * n_chips (each chip's shard must hold whole
    grid tiles), and scales with the mesh so per-chip work is constant."""
    bt = tile_b(T)
    per_chip = bt * max(1, _FIXED_CELLS // max(T, 160) // bt)
    return per_chip * _mesh_n()


def _pad_rows(arrs, B, Bp, fills):
    if Bp == B:
        return arrs
    out = []
    for a, fill in zip(arrs, fills):
        pad = np.full((Bp - B,) + a.shape[1:], fill, a.dtype)
        out.append(np.concatenate([a, pad], axis=0))
    return out


def sub_b(T: int, n: int) -> int:
    """Smallest shape-stable batch >= n.

    Below one grid tile: pow2 multiples of 8*mesh_n (the kernels tile at
    BT = min(tile_b, B), so a 16-row round at (2048, 128) no longer pads
    to tile_b(128)=512 rows — 3% utilization, the dominant waste on the
    test.fq workload).  Above a tile: a ~1.25x geometric ladder of
    tile-granularity multiples capped at fixed_b — the round-4 ladder had
    only octave rungs ({BF/8..BF}), so a 1025-row round padded to 2048;
    on the bench workload that one group was 70% of dispatched wavefront
    cells at 50% row fill (evals/hw_r05, VERDICT r4 weak #4).  Only rungs
    that actually occur compile (~1.2 s each once)."""
    BF = fixed_b(T)
    mn = _mesh_n()
    tg = tile_b(T) * mn
    if n <= tg:
        c = 8 * mn
        while c < n:
            c *= 2
        return min(c, tg)
    g = tg
    m = 1
    while True:
        cand = m * g
        if cand >= BF:
            return BF
        if n <= cand:
            return cand
        # next rung: ~1.25x up, staying integral
        m += max(1, m // 4)


def global_batch(q, qlen, t, tlen, qle, scores=DEFAULT_SCORES, K=4,
                 iden_only=False):
    """(iden_n, t_left_ext) for a padded batch of global alignments.

    Any B; internally tiled to tile_b(T) rows per pallas grid step. Inputs
    are NumPy uint8 (shipped to the device as bytes, cast in-jit); outputs
    stay on device (caller pulls once per round). A batch that is already
    a tile_b(T) multiple at or below fixed_b(T) runs at its own size
    (sub-shape); anything else pads/splits at fixed_b(T).

    iden_only=True runs the leaner annotation variant (tleft returned as
    zeros) — for callers that never read tleft (run_giden / aveMatch).
    """
    B, LQ = q.shape
    T = t.shape[1]
    BF = fixed_b(T)
    mesh = _mesh()

    def _dispatch_global(q_, t_, qlen_, tlen_, qle_):
        qt = np.concatenate(
            [_pack2(np.asarray(q_, np.uint8)),
             _pack2(np.asarray(t_, np.uint8))], axis=1)
        meta = np.stack(
            [np.asarray(qlen_, np.int32), np.asarray(tlen_, np.int32),
             np.asarray(qle_, np.int32)], axis=1)
        args = (jnp.asarray(qt), jnp.asarray(meta))
        if mesh is not None:
            return _sharded_global(
                mesh, LQ, T, K, tuple(scores), not iden_only)(*args)
        return _run_global(*args, LQ, T, K, tuple(scores), not iden_only)

    if B < BF and _shape_ok(T, B):
        return _dispatch_global(q, t, qlen, tlen, qle)
    if B > BF:
        parts = [
            global_batch(q[i:i + BF], qlen[i:i + BF], t[i:i + BF],
                         tlen[i:i + BF], qle[i:i + BF], scores, K,
                         iden_only)
            for i in range(0, B, BF)
        ]
        return (jnp.concatenate([p[0] for p in parts]),
                jnp.concatenate([p[1] for p in parts]))
    q, t, qlen, tlen, qle = _pad_rows(
        [np.asarray(q, np.uint8), np.asarray(t, np.uint8),
         np.asarray(qlen, np.int32), np.asarray(tlen, np.int32),
         np.asarray(qle, np.int32)],
        B, BF, [4, 4, 1, 1, 0],
    )
    iden, tleft = _dispatch_global(q, t, qlen, tlen, qle)
    return iden[:B], tleft[:B]


def ext_batch(q, qlen, t, tlen, scores=DEFAULT_SCORES, K=4):
    """(max, max_t, max_q, score) for a padded batch, any B."""
    B, LQ = q.shape
    T = t.shape[1]
    BF = fixed_b(T)
    mesh = _mesh()

    def _dispatch_ext(q_, t_, qlen_, tlen_):
        qt = np.concatenate(
            [_pack2(np.asarray(q_, np.uint8)),
             _pack2(np.asarray(t_, np.uint8))], axis=1)
        meta = np.stack(
            [np.asarray(qlen_, np.int32), np.asarray(tlen_, np.int32),
             np.zeros(len(qt), np.int32)], axis=1)
        args = (jnp.asarray(qt), jnp.asarray(meta))
        if mesh is not None:
            return _sharded_ext(mesh, LQ, T, K, tuple(scores))(*args)
        return _run_ext(*args, LQ, T, K, tuple(scores))

    if B < BF and _shape_ok(T, B):
        return _dispatch_ext(q, t, qlen, tlen)
    if B > BF:
        parts = [
            ext_batch(q[i:i + BF], qlen[i:i + BF], t[i:i + BF],
                      tlen[i:i + BF], scores, K)
            for i in range(0, B, BF)
        ]
        return tuple(
            jnp.concatenate([p[j] for p in parts]) for j in range(4)
        )
    q, t, qlen, tlen = _pad_rows(
        [np.asarray(q, np.uint8), np.asarray(t, np.uint8),
         np.asarray(qlen, np.int32), np.asarray(tlen, np.int32)],
        B, BF, [4, 4, 1, 1],
    )
    mx, mt, mq, sc = _dispatch_ext(q, t, qlen, tlen)
    return mx[:B], mt[:B], mq[:B], sc[:B]
