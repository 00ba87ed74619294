"""Pallas TPU kernel for profile-POA alignment (device path of
ops/poa_profile.py).

One grid step per unit base (row-major Gotoh), state in VMEM scratch:
  * M and the insertion track are elementwise over the [B, T] column lanes
  * the occupancy-weighted deletion track uses the prefix form
      F[c] = cummax_{c'<c}(G[c'] + W[c']) - O_d - W[c]
    — one log2(T) shift-max cummax per row instead of a sequential lane walk
  * backtrack bits: 2-bit H selector + I-continuation + F-continuation,
    where fcont[c] = (F[c-1] >= G[c-1] - O_d) is elementwise because the
    per-column weight cancels (see ops/poa_profile.py)

The backtrack itself (op emission for Profile.update) runs as a vmapped XLA
while_loop over the dirs tensor, like the wavefront kernel's.

Bit-exact with the NumPy reference: all scores are fixed-point int32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .poa_profile import SCALE

NEG = -(1 << 30)
# op codes emitted by the backtrack (right-to-left)
OP_M, OP_I, OP_D, OP_PAD = 0, 1, 2, 3


def _kernel(
    qbuf_ref,    # [B, rows+256] int32 unit bases (4-padded)
    sub_ref,     # [B, 5, T] int32 substitution scores per base code
    w_ref,       # [B, T] int32 prefix sums W[c] (c = lane+1)
    qlen_ref,    # [B, 1] int32
    tlen_ref,    # [B, 1] int32
    dirs_ref,    # out [1, B, T] uint8
    score_ref,   # out [B, 1] int32 (H[Lq][tlen])
    h_ref, e_ref, h0_ref, e0_ref, qrr_unused,  # scratch
    *,
    T: int,
    oi: int,
    ei: int,
    od: int,
):
    r = pl.program_id(0)  # row j-1 (this step consumes unit base j = r+1)
    B = w_ref.shape[0]
    qlen = qlen_ref[:, 0:1]
    tlen = tlen_ref[:, 0:1]
    ti = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)  # lane = c-1

    @pl.when(r == 0)
    def _init():
        # H[0][c] = -(O_d + W[c]); H[0][0] = 0
        h_ref[:] = -(od + w_ref[:])
        e_ref[:] = jnp.full((B, T), NEG, jnp.int32)
        h0_ref[:] = jnp.zeros((B, 1), jnp.int32)
        e0_ref[:] = jnp.full((B, 1), NEG, jnp.int32)
        score_ref[:] = jnp.full((B, 1), NEG, jnp.int32)

    active = r < qlen  # [B, 1]

    # unit base for this row: aligned 128-window + one-hot extract
    r_al = pl.multiple_of(r // 128 * 128, 128)
    qwin = qbuf_ref[:, pl.ds(r_al, 128)]
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
    qj = jnp.sum(jnp.where(lane128 == (r - r_al), qwin, 0), axis=1, keepdims=True)

    # substitution scores for this base: select among the 5 stored rows
    s = sub_ref[:, 0, :]
    for b in range(1, 5):
        s = jnp.where(qj == b, sub_ref[:, b, :], s)

    Hp = h_ref[:]
    H0p = h0_ref[:]
    Ep = e_ref[:]
    E0p = e0_ref[:]
    W = w_ref[:]

    # M[c] = H[j-1][c-1] + s[c]
    Hp_sh = jnp.where(ti == 0, H0p, pltpu.roll(Hp, 1, 1))
    M = Hp_sh + s
    # insertion track
    e_open = Hp - oi - ei
    E = jnp.maximum(e_open, Ep - ei)
    icont = (Ep - ei) > e_open
    E0 = jnp.maximum(H0p - oi - ei, E0p - ei)
    G = jnp.maximum(M, E)
    # weighted deletion track via prefix cummax of keyed = G + W
    keyed = G + W
    cm = keyed
    sh = 1
    while sh < T:
        rolled = pltpu.roll(cm, sh, 1)
        cm = jnp.maximum(cm, jnp.where(ti < sh, NEG, rolled))
        sh *= 2
    # run[c-1] = max(keyed0=E0 (W0=0), cm up to lane c-2)
    cm_sh = jnp.where(ti == 0, NEG, pltpu.roll(cm, 1, 1))
    run_prev = jnp.maximum(E0, cm_sh)
    F = run_prev - od - W
    Hrow = jnp.maximum(G, F)
    # F-continuation: F[c] from F[c-1] (weights cancel)
    F_sh = jnp.where(ti == 0, NEG, pltpu.roll(F, 1, 1))
    G_sh = jnp.where(ti == 0, E0, pltpu.roll(G, 1, 1))
    fcont = F_sh >= (G_sh - od)

    sel = jnp.where(F > G, 2, jnp.where(E > M, 1, 0))
    d = (
        sel
        | jnp.where(icont, 4, 0)
        | jnp.where(fcont, 8, 0)
    ).astype(jnp.uint8)

    maskB = active  # [B,1] broadcasting over lanes
    h_ref[:] = jnp.where(maskB, Hrow, Hp)
    e_ref[:] = jnp.where(maskB, E, Ep)
    h0_ref[:] = jnp.where(active, -(oi + (r + 1) * ei), H0p)
    e0_ref[:] = jnp.where(active, E0, E0p)
    dirs_ref[0] = jnp.where(maskB, d, jnp.uint8(0))

    # capture the final score at the last active row
    is_last = active & (r == qlen - 1)
    h_at_t = jnp.sum(
        jnp.where(ti == tlen - 1, Hrow, 0), axis=1, keepdims=True
    )
    score_ref[:] = jnp.where(is_last, h_at_t, score_ref[:])


@functools.partial(jax.jit, static_argnames=("oi", "ei", "od"))
def _run(qbuf, sub, w, qlen, tlen, oi, ei, od):
    B, _, T = sub.shape
    n_rows = qbuf.shape[1] - 256
    kern = functools.partial(_kernel, T=T, oi=oi, ei=ei, od=od)
    dirs, score = pl.pallas_call(
        kern,
        grid=(n_rows,),
        in_specs=[
            pl.BlockSpec(qbuf.shape, lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(sub.shape, lambda r: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, B, T), lambda r: (r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, B, T), jnp.uint8),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, T), jnp.int32),
            pltpu.VMEM((B, T), jnp.int32),
            pltpu.VMEM((B, 1), jnp.int32),
            pltpu.VMEM((B, 1), jnp.int32),
            pltpu.VMEM((B, 1), jnp.int32),
        ],
    )(qbuf, sub, w, qlen, tlen)
    return dirs, score


def _backtrack_profile(dirs, qlen, tlen, max_steps):
    """Emit ops right-to-left: OP_M / OP_I / OP_D from the dirs bits."""
    ops = jnp.full(max_steps, OP_PAD, jnp.int8)

    def cond(st):
        j, c, state, ops, n = st
        return (j > 0) | (c > 0)

    def body(st):
        j, c, state, ops, n = st
        # boundary handling first
        at_top = j == 0
        at_left = c == 0
        d = dirs[jnp.maximum(j - 1, 0), jnp.maximum(c - 1, 0)].astype(jnp.int32)
        sel = jnp.where(state < 0, d & 3, state)
        sel = jnp.where(at_top, 2, jnp.where(at_left, 1, sel))
        is_m = sel == 0
        is_i = sel == 1
        op = jnp.where(is_m, OP_M, jnp.where(is_i, OP_I, OP_D)).astype(jnp.int8)
        ops = ops.at[n].set(op)
        jn = j - jnp.where(is_m | is_i, 1, 0)
        cn = c - jnp.where(is_m | (~is_m & ~is_i), 1, 0)
        # continuation: I keeps state while icont bit set at the consumed cell
        icont = (d >> 2) & 1
        fcont = (d >> 3) & 1
        nstate = jnp.where(
            is_m,
            -1,
            jnp.where(
                is_i,
                jnp.where(icont == 1, 1, -1),
                jnp.where(fcont == 1, 2, -1),
            ),
        )
        nstate = jnp.where(at_top | at_left, nstate, nstate)
        return (jn, cn, nstate, ops, n + 1)

    j, c, state, ops, n = jax.lax.while_loop(
        cond, body, (qlen, tlen, jnp.int32(-1), ops, jnp.int32(0))
    )
    return ops, n


@functools.partial(jax.jit, static_argnames=())
def _backtrack_batch(dirs, qlen, tlen):
    max_steps = dirs.shape[0] + dirs.shape[2] + 1

    def one(dirs_b, ql, tl):
        return _backtrack_profile(dirs_b, ql, tl, max_steps)

    return jax.vmap(one, in_axes=(1, 0, 0))(dirs, qlen, tlen)


def align_batch(
    units,          # list of np uint8 arrays (one per problem)
    subs,           # list of [ncol, 5] int arrays
    ws,             # list of [ncol] prefix-sum arrays
    LQ: int,
    T: int,
    gap_open: int,
    gap_ext: int,
    B: int = 0,
):
    """Align each unit to its profile scores; returns per-problem
    (ops, cols, qpos) arrays for Profile.update_arrays.
    B fixes the padded batch shape (0 = round len(units) up to 8)."""
    if B <= 0:
        B = ((len(units) + 7) // 8) * 8
    rows = ((LQ + 127) // 128) * 128
    qbuf = np.full((B, rows + 256), 4, np.int32)
    sub = np.full((B, 5, T), -SCALE * 64, np.int32)
    w = np.zeros((B, T), np.int32)
    qlen = np.ones(B, np.int32)
    tlen = np.ones(B, np.int32)
    for i, (u, sc, wc) in enumerate(zip(units, subs, ws)):
        qbuf[i, : len(u)] = u
        sub[i, :, : sc.shape[0]] = sc.T
        w[i, : len(wc)] = wc
        # padding columns beyond tlen: huge deletion cost never chosen
        if len(wc) < T:
            w[i, len(wc):] = wc[-1] if len(wc) else 0
        qlen[i] = len(u)
        tlen[i] = sc.shape[0]
    oi = SCALE * gap_open
    ei = SCALE * gap_ext
    od = SCALE * gap_open
    dirs, score = _run(
        jnp.asarray(qbuf), jnp.asarray(sub), jnp.asarray(w),
        jnp.asarray(qlen.reshape(-1, 1)), jnp.asarray(tlen.reshape(-1, 1)),
        oi, ei, od,
    )
    ops_arr, n_arr = _backtrack_batch(
        dirs, jnp.asarray(qlen), jnp.asarray(tlen)
    )
    ops_arr = np.asarray(ops_arr)
    n_arr = np.asarray(n_arr)
    out = []
    for i in range(len(units)):
        out.append(_ops_to_path(ops_arr[i], int(n_arr[i])))
    return out


def _ops_to_path(ops_rl: np.ndarray, n: int):
    """Right-to-left op codes -> vectorized (kinds, cols, qpos) arrays in
    left-to-right order (consumed by Profile.update_arrays)."""
    ops = ops_rl[:n][::-1].astype(np.int64)
    consumes_c = ops != OP_I
    consumes_q = ops != OP_D
    cols = np.cumsum(consumes_c) - 1  # for I ops: last consumed column
    qpos = np.cumsum(consumes_q) - 1
    return ops, cols, qpos
