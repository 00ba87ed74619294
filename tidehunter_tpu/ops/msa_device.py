"""Device-resident profile-POA consensus (MSA v2).

The v1 device path (removed; see git history) ping-ponged per unit round: host
computed substitution scores, the device aligned, an XLA while_loop walked
the direction tensor, the ops arrays were pulled to the host and the
profile updated in NumPy.  On this platform every pull costs ~25 ms and
the while_loop backtrack costs 5x the DP, so MSA dominated the pipeline.

v2 keeps ALL state on the device across rounds:

  counts [B, T, 5] int32   profile column base counts
  n_placed, ncol, overflow per region

and runs each unit round as four host-pull-free dispatches:

  1. _scores_step (jit): substitution scores + weighted-deletion prefix
     sums from counts — the same fixed-point arithmetic as
     ops/poa_profile.Profile.sub_scores/del_weights.
  2. _dp pallas kernel: the profile Gotoh DP in ANTI-DIAGONAL form.  The
     row-major form needs a prefix-cummax per row for the
     occupancy-weighted deletion track; on the wavefront the same track is
     the ordinary elementwise recurrence F[j][c] = max(G[j][c-1] - od,
     F[j][c-1]) - wdel[c] because (j, c-1) lives on the previous
     anti-diagonal.  Direction bytes (sel | icont<<2 | fcont<<3) stream to
     HBM.
  3. _backtrack pallas kernel: lockstep level walk.  In anti-diagonal
     coordinates every backtrack step decreases L = j + c by exactly 1
     (M by 2), so one reverse sweep over levels — streaming dirs rows from
     HBM at full bandwidth — advances every problem in lockstep; the op
     emitted at each level lands in a level-indexed output row, which read
     left-to-right IS the alignment path.
  4. _update_step (jit): Profile.update_arrays as batched gather/scatter.

Tie-break rules (M over I over D; I-run continuation on strict >; D-run
continuation on >=) are exactly those of ops/poa_profile.align_to_profile,
so consensus output is bit-identical with the host profile_consensus.

The consensus (majority base per column, column dropped when gaps
outnumber the best base, coverage = count of units with the consensus
base — the abPOA RC contract, reference src/abpoa_cons.c:92-107) is
extracted on device and pulled ONCE per region batch.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import numpy as np

from .poa_profile import SCALE

NEG = -(1 << 30)
OP_M, OP_I, OP_D, OP_PAD = 0, 1, 2, 3

# CPU-interpret escape hatch (see ops/wavefront.py INTERPRET): lets the
# multi-chip dryrun and CPU CI run these kernels through the Pallas
# interpreter on a virtual device mesh.
import os
INTERPRET = os.environ.get("TH_PALLAS_INTERPRET", "") == "1"

# Test/dryrun override: cap the per-shard region batch (interpret mode is
# ~1000x slower than hardware; production leaves this None).
_B_CAP = None

# Band window ladder: a region runs at the narrowest eligible window
# (wb = W - 8 must fit twice the unit-length spread), escalating one rung
# on band-touch, with the full-width kernel as the last rung.  DP cost is
# rows * W, so W=128 beats the full kernel ~T/128 x.  Defined in
# poa_profile so the host oracle (banded_profile_consensus) and the
# device driver share ONE definition.
from .poa_profile import BAND_LADDER, band_ladder  # noqa: F401


def _modules():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return jax, jnp, pl, pltpu


# ------------------------------------------------------------ DP kernel --


def _make_dp_kernel(T: int, K: int, oi: int, ei: int, od: int,
                    oi2: int, ei2: int, od2: int):
    jax, jnp, pl, pltpu = _modules()

    def kernel(maxr_ref, qbuf_ref, sub_ref, wl_ref, wdel_ref,
               wl2_ref, wdel2_ref, qlen_ref,
               ncol_ref,
               dirs_ref,
               he_ref, ho_ref, e_ref, f_ref, g_ref, qrr_ref,
               e2_ref, f2_ref):
        rk = pl.program_id(1)
        B = wl_ref.shape[0]
        Lq = qlen_ref[:, 0:1]
        Tn = ncol_ref[:, 0:1]
        ti = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
        # rows beyond the batch-wide max(qlen + ncol - 1) hold no live
        # cells (per-problem masks are all False there); skipping them
        # saves the ~35% of ticks the bucket margin pads on. Their dirs
        # rows stay unwritten — the backtrack's act mask (j + c == L)
        # never selects levels above qlen + ncol, so junk is never read.
        maxr = maxr_ref[0, 0]

        @pl.when(rk == 0)
        def _init():
            he_ref[:] = jnp.full((B, T), NEG, jnp.int32)
            ho_ref[:] = jnp.full((B, T), NEG, jnp.int32)
            e_ref[:] = jnp.full((B, T), NEG, jnp.int32)
            f_ref[:] = jnp.full((B, T), NEG, jnp.int32)
            g_ref[:] = jnp.full((B, T), NEG, jnp.int32)
            qrr_ref[:] = jnp.full((B, T), 4, jnp.int32)
            e2_ref[:] = jnp.full((B, T), NEG, jnp.int32)
            f2_ref[:] = jnp.full((B, T), NEG, jnp.int32)

        Wl = wl_ref[:]
        Wl_sh = jnp.where(ti == 0, 0, pltpu.roll(Wl, 1, 1))
        Wl2 = wl2_ref[:]
        Wl2_sh = jnp.where(ti == 0, 0, pltpu.roll(Wl2, 1, 1))

        for kk in range(K):
            r = rk * K + kk

            @pl.when(r < maxr)
            def _row(r=r, kk=kk):
                _dp_one_row(
                    jax, jnp, pl, pltpu, r, kk, T,
                    (oi, ei, od, oi2, ei2, od2),
                    qbuf_ref, sub_ref, wdel_ref, wdel2_ref, dirs_ref,
                    he_ref, ho_ref, e_ref, f_ref, g_ref, qrr_ref,
                    e2_ref, f2_ref,
                    Lq, Tn, ti, Wl, Wl_sh, Wl2, Wl2_sh, B,
                )

    return kernel


def _dp_one_row(jax, jnp, pl, pltpu, r, kk, T, costs,
                qbuf_ref, sub_ref, wdel_ref, wdel2_ref, dirs_ref,
                he_ref, ho_ref, e_ref, f_ref, g_ref, qrr_ref,
                e2_ref, f2_ref,
                Lq, Tn, ti, Wl, Wl_sh, Wl2, Wl2_sh, B):
    oi, ei, od, oi2, ei2, od2 = costs
    # unit base for the new diagonal cell: same window trick as
    # ops/wavefront._qrow (query index = r - lane)
    r_al = pl.multiple_of(r // 128 * 128, 128)
    qwin = qbuf_ref[:, pl.ds(r_al, 128)]
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
    q_r = jnp.sum(
        jnp.where(lane128 == (r - r_al), qwin, 0), axis=1,
        keepdims=True)
    qb = jnp.where(ti == 0, q_r, pltpu.roll(qrr_ref[:], 1, 1))
    qrr_ref[:] = qb

    # interior cell (j, c): lane t = c-1, j = r - t + 1
    mask = ((ti <= r) & (ti >= r - Lq + 1) & (ti < Tn)
            & (r < Lq + Tn - 1))

    s = sub_ref[:, 0, :]
    for bb in range(1, 5):
        s = jnp.where(qb == bb, sub_ref[:, bb, :], s)

    if kk % 2 == 0:
        hp2_ref, hp_ref = he_ref, ho_ref
    else:
        hp2_ref, hp_ref = ho_ref, he_ref

    # convex (dual-affine) boundaries: best pure-insertion of g bases =
    # -min(oi+g*ei, oi2+g*ei2); best pure-deletion of a column prefix =
    # -min(od+W1, od2+W2)  (abPOA contract, reference src/abpoa_cons.c:15-20)
    def ins0(g):
        return jnp.maximum(-(oi + g * ei), -(oi2 + g * ei2))

    # M: H[j-1][c-1] at (r-2, t-1)
    hm = pltpu.roll(hp2_ref[:], 1, 1)
    hm = jnp.where(ti == 0, ins0(r), hm)              # c-1==0, j-1>=1
    hm = jnp.where(
        ti == r,
        jnp.where(ti == 0, 0,
                  jnp.maximum(-(od + Wl_sh), -(od2 + Wl2_sh))),  # j-1==0
        hm)
    M = hm + s

    # E (insertion, consumes unit): refs at (r-1, t); two tracks
    hp = hp_ref[:]
    h_up = jnp.where(
        ti == r, jnp.maximum(-(od + Wl), -(od2 + Wl2)), hp)  # j-1==0
    e_up = jnp.where(ti == r, NEG, e_ref[:])
    e_open = h_up - oi - ei
    e_cont = e_up - ei
    E1 = jnp.maximum(e_open, e_cont)
    icont1 = e_cont > e_open
    e2_up = jnp.where(ti == r, NEG, e2_ref[:])
    e2_open = h_up - oi2 - ei2
    e2_cont = e2_up - ei2
    E2 = jnp.maximum(e2_open, e2_cont)
    icont2 = e2_cont > e2_open
    E = jnp.maximum(E1, E2)
    isel2 = E2 > E1

    # F (deletion, consumes column): refs at (r-1, t-1); two tracks
    g_sh = pltpu.roll(g_ref[:], 1, 1)
    g_sh = jnp.where(ti == 0, ins0(r + 1), g_sh)      # c-1==0
    f_sh = pltpu.roll(f_ref[:], 1, 1)
    f_sh = jnp.where(ti == 0, NEG, f_sh)
    wd = wdel_ref[:]
    F1 = jnp.maximum(g_sh - od, f_sh) - wd
    fcont1 = f_sh >= (g_sh - od)
    f2_sh = pltpu.roll(f2_ref[:], 1, 1)
    f2_sh = jnp.where(ti == 0, NEG, f2_sh)
    wd2 = wdel2_ref[:]
    F2 = jnp.maximum(g_sh - od2, f2_sh) - wd2
    fcont2 = f2_sh >= (g_sh - od2)
    F = jnp.maximum(F1, F2)
    fsel2 = F2 > F1

    G = jnp.maximum(M, E)
    H = jnp.maximum(G, F)
    sel = jnp.where(F > G, 2, jnp.where(E > M, 1, 0))
    d = (sel
         | jnp.where(icont1, 4, 0) | jnp.where(fcont1, 8, 0)
         | jnp.where(isel2, 16, 0) | jnp.where(fsel2, 32, 0)
         | jnp.where(icont2, 64, 0) | jnp.where(fcont2, 128, 0)
         ).astype(jnp.uint8)

    hp2_ref[:] = jnp.where(mask, H, hp2_ref[:])
    e_ref[:] = jnp.where(mask, E1, e_ref[:])
    e2_ref[:] = jnp.where(mask, E2, e2_ref[:])
    f_ref[:] = jnp.where(mask, F1, f_ref[:])
    f2_ref[:] = jnp.where(mask, F2, f2_ref[:])
    g_ref[:] = jnp.where(mask, G, g_ref[:])
    dirs_ref[kk] = jnp.where(mask, d, jnp.uint8(0))


def _band_base(jnp, r, T, W):
    """Per-row window base for the |c-j| <= wb band (wb = W - 8): the
    band's live lane range at anti-diagonal r is
    [(r-wb)/2, (r+wb)/2] (wb+1 lanes), so the base slides by exactly one
    lane every two rows; clamped to [0, T-W].  The -2 keeps two lanes of
    left slack so a left-band-edge cell's in-band M/F predecessors are
    still inside the window after the slide (live lanes sit in
    [2, wb+5] of the W-lane window).  Works with python-int and traced
    r."""
    wb = W - 8
    base = ((r - wb) >> 1 if isinstance(r, int) else
            jnp.right_shift(r - wb, 1)) - 2
    if isinstance(r, int):
        return max(0, min(base, T - W))
    return jnp.maximum(0, jnp.minimum(base, T - W))


def _make_dp_kernel_banded(T: int, K: int, W: int, oi: int, ei: int,
                           od: int, oi2: int, ei2: int, od2: int):
    """|c-j| <= wb banded variant (wb = W - 8): scratch and dirs live in
    a W-lane window that slides right by ONE lane every two
    anti-diagonals (a conditional roll of the scratch refs — no
    alignment margin, unlike the retired 384-lane-margin design; at
    W=128 a row costs 128 lanes against the full kernel's T).  The
    windowed views of the 9 per-column arrays (5 sub planes + 4 gap
    weights) are CACHED in scratch and maintained incrementally: on a
    shift row each rolls left one lane and the newly exposed right lane
    is filled with a single 128-aligned extract — the retired
    load-per-row scheme (wide slice + dynamic roll, 9x per row) was the
    dominant per-row cost of the whole MSA.  Regions whose optimal path
    reaches the band edge are flagged by the touch step and retried
    wider/full; the host oracle (ops/poa_profile.banded_profile_consensus)
    applies the identical band + ladder rule, so the host/device pair
    stays bit-equal."""
    jax, jnp, pl, pltpu = _modules()

    def kernel(maxr_ref, qbuf_ref, sub_ref, wl_ref, wdel_ref,
               wl2_ref, wdel2_ref, qlen_ref,
               ncol_ref,
               dirs_ref,
               he_ref, ho_ref, e_ref, f_ref, g_ref, qrr_ref,
               e2_ref, f2_ref,
               sw0_ref, sw1_ref, sw2_ref, sw3_ref, sw4_ref,
               wlw_ref, wl2w_ref, wdw_ref, wd2w_ref):
        rk = pl.program_id(1)
        B = wl_ref.shape[0]
        Lq = qlen_ref[:, 0:1]
        Tn = ncol_ref[:, 0:1]
        maxr = maxr_ref[0, 0]
        subw = (sw0_ref, sw1_ref, sw2_ref, sw3_ref, sw4_ref)
        wins = ((wlw_ref, wl_ref), (wl2w_ref, wl2_ref),
                (wdw_ref, wdel_ref), (wd2w_ref, wdel2_ref))

        @pl.when(rk == 0)
        def _init():
            for ref in (he_ref, ho_ref, e_ref, f_ref, g_ref,
                        e2_ref, f2_ref):
                ref[:] = jnp.full((B, W), NEG, jnp.int32)
            qrr_ref[:] = jnp.full((B, W), 4, jnp.int32)
            # _band_base(r=0) == 0: the initial windows are the plain
            # first W lanes
            for bb in range(5):
                subw[bb][:] = sub_ref[:, bb, :W]
            for wref, src in wins:
                wref[:] = src[:, :W]

        for kk in range(K):
            rr = rk * K + kk   # traced through rk

            @pl.when(rr < maxr)
            def _row(kk=kk, rr=rr):
                _dp_one_row_banded(
                    jax, jnp, pl, pltpu, rr, kk, T, K, W,
                    (oi, ei, od, oi2, ei2, od2),
                    qbuf_ref, sub_ref, dirs_ref,
                    he_ref, ho_ref, e_ref, f_ref, g_ref, qrr_ref,
                    e2_ref, f2_ref, subw, wins,
                    Lq, Tn, B,
                )

    return kernel


def _dp_one_row_banded(jax, jnp, pl, pltpu, r, kk, T, K, W, costs,
                       qbuf_ref, sub_ref, dirs_ref,
                       he_ref, ho_ref, e_ref, f_ref, g_ref, qrr_ref,
                       e2_ref, f2_ref, subw, wins,
                       Lq, Tn, B):
    oi, ei, od, oi2, ei2, od2 = costs
    base = _band_base(jnp, r, T, W)
    prev_base = _band_base(jnp, r - 1, T, W)
    shift = base - prev_base          # exactly 0 or 1

    li = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)

    @pl.when(shift != 0)
    def _advance():
        # slide every scratch ref left by one lane (right-roll by W-1),
        # filling the newly exposed right lane with its init value.  qrr
        # is NOT rolled: its previous row already holds q[r - ti] for
        # the shifted lanes (see qb below).
        for ref, fill in ((he_ref, NEG), (ho_ref, NEG), (e_ref, NEG),
                          (f_ref, NEG), (g_ref, NEG), (e2_ref, NEG),
                          (f2_ref, NEG)):
            ref[:] = jnp.where(
                li == W - 1, fill, pltpu.roll(ref[:], W - 1, 1))
        # cached windows slide with the band: roll left one lane, fill
        # the new right lane (global column base + W - 1) with a single
        # 128-aligned extract from the full-width source
        cnew = base + W - 1
        A = pl.multiple_of(
            jnp.minimum(cnew // 128 * 128, T - 128), 128)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
        sel = lane128 == (cnew - A)
        for bb in range(5):
            v = jnp.sum(jnp.where(sel, sub_ref[:, bb, pl.ds(A, 128)], 0),
                        axis=1, keepdims=True)
            subw[bb][:] = jnp.where(
                li == W - 1, v, pltpu.roll(subw[bb][:], W - 1, 1))
        for wref, src in wins:
            v = jnp.sum(jnp.where(sel, src[:, pl.ds(A, 128)], 0),
                        axis=1, keepdims=True)
            wref[:] = jnp.where(
                li == W - 1, v, pltpu.roll(wref[:], W - 1, 1))

    ti = li + base                    # global lane = column-1
    wb = W - 8
    off = 2 * ti - r                  # c - j of the current cell
    bandok = jnp.abs(off) <= wb
    # predecessor band masks: out-of-band neighbors read as NEG so the
    # band semantics equal the host mirror's row masking exactly (a lane
    # leaves the band permanently, so its scratch holds stale values)
    m_up = jnp.abs(off + 1) <= wb     # (j-1, c)  : h_up/e_up/e2_up
    m_dl = jnp.abs(off - 1) <= wb     # (j, c-1)  : g_sh/f_sh/f2_sh

    # q base for the new diagonal cell (global query index = r - ti).
    # On shift rows the previous row's register already holds
    # q[(r-1) - (li + base-1)] = q[r - ti] at every lane — no roll; on
    # non-shift rows it rolls right one lane with the window's left-edge
    # value q[r - base] inserted at lane 0.
    qi = r - base                     # query index entering at lane 0
    qi_al = pl.multiple_of(qi // 128 * 128, 128)
    qwin = qbuf_ref[:, pl.ds(qi_al, 128)]
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
    q_left = jnp.sum(
        jnp.where(lane128 == (qi - qi_al), qwin, 0), axis=1, keepdims=True)
    qb = jnp.where(
        shift != 0,
        qrr_ref[:],
        jnp.where(li == 0, q_left, pltpu.roll(qrr_ref[:], 1, 1)))
    qrr_ref[:] = qb

    mask = ((ti <= r) & (ti >= r - Lq + 1) & (ti < Tn)
            & (r < Lq + Tn - 1) & bandok)

    s = subw[0][:]
    for bb in range(1, 5):
        s = jnp.where(qb == bb, subw[bb][:], s)
    (wlw_ref, _), (wl2w_ref, _), (wdw_ref, _), (wd2w_ref, _) = wins
    Wl = wlw_ref[:]
    Wl2 = wl2w_ref[:]
    wd = wdw_ref[:]
    wd2 = wd2w_ref[:]
    Wl_sh = jnp.where(ti == 0, 0, pltpu.roll(Wl, 1, 1))
    Wl2_sh = jnp.where(ti == 0, 0, pltpu.roll(Wl2, 1, 1))

    def ins0(g):
        return jnp.maximum(-(oi + g * ei), -(oi2 + g * ei2))

    if kk % 2 == 0:
        hp2_ref, hp_ref = he_ref, ho_ref
    else:
        hp2_ref, hp_ref = ho_ref, he_ref

    # NOTE on rolls at the window edge: lane 0 wraps to lane W-1's stale
    # value, but when base > 0 lane `base` is strictly outside the live
    # band (the band's left edge lane is base+3..base+4 by the floor in
    # _band_base), so the wrapped value is masked dead; when base == 0
    # the ti==0 guards override lane 0 anyway.
    hm = pltpu.roll(hp2_ref[:], 1, 1)
    hm = jnp.where(ti == 0, ins0(r), hm)
    hm = jnp.where(
        ti == r,
        jnp.where(ti == 0, 0,
                  jnp.maximum(-(od + Wl_sh), -(od2 + Wl2_sh))),
        hm)
    M = hm + s

    hp = hp_ref[:]
    h_up = jnp.where(
        ti == r, jnp.maximum(-(od + Wl), -(od2 + Wl2)), hp)
    h_up = jnp.where(m_up, h_up, NEG)
    e_up = jnp.where((ti == r) | ~m_up, NEG, e_ref[:])
    e_open = h_up - oi - ei
    e_cont = e_up - ei
    E1 = jnp.maximum(e_open, e_cont)
    icont1 = e_cont > e_open
    e2_up = jnp.where((ti == r) | ~m_up, NEG, e2_ref[:])
    e2_open = h_up - oi2 - ei2
    e2_cont = e2_up - ei2
    E2 = jnp.maximum(e2_open, e2_cont)
    icont2 = e2_cont > e2_open
    E = jnp.maximum(E1, E2)
    isel2 = E2 > E1

    g_sh = pltpu.roll(g_ref[:], 1, 1)
    g_sh = jnp.where(ti == 0, ins0(r + 1), g_sh)
    g_sh = jnp.where(m_dl, g_sh, NEG)
    f_sh = pltpu.roll(f_ref[:], 1, 1)
    f_sh = jnp.where((ti == 0) | ~m_dl, NEG, f_sh)
    F1 = jnp.maximum(g_sh - od, f_sh) - wd
    fcont1 = f_sh >= (g_sh - od)
    f2_sh = pltpu.roll(f2_ref[:], 1, 1)
    f2_sh = jnp.where((ti == 0) | ~m_dl, NEG, f2_sh)
    F2 = jnp.maximum(g_sh - od2, f2_sh) - wd2
    fcont2 = f2_sh >= (g_sh - od2)
    F = jnp.maximum(F1, F2)
    fsel2 = F2 > F1

    G = jnp.maximum(M, E)
    H = jnp.maximum(G, F)
    sel = jnp.where(F > G, 2, jnp.where(E > M, 1, 0))
    d = (sel
         | jnp.where(icont1, 4, 0) | jnp.where(fcont1, 8, 0)
         | jnp.where(isel2, 16, 0) | jnp.where(fsel2, 32, 0)
         | jnp.where(icont2, 64, 0) | jnp.where(fcont2, 128, 0)
         ).astype(jnp.uint8)

    hp2_ref[:] = jnp.where(mask, H, hp2_ref[:])
    e_ref[:] = jnp.where(mask, E1, e_ref[:])
    e2_ref[:] = jnp.where(mask, E2, e2_ref[:])
    f_ref[:] = jnp.where(mask, F1, f_ref[:])
    f2_ref[:] = jnp.where(mask, F2, f2_ref[:])
    g_ref[:] = jnp.where(mask, G, g_ref[:])
    dirs_ref[kk] = jnp.where(mask, d, jnp.uint8(0))


# ----------------------------------------------------- backtrack kernel --


def _make_bt_kernel(T: int, NL: int, WP: int | None = None):
    """WP set = banded variant: dirs rows are WP-wide windows; the lane
    holding cell (j, c) at level L is (c-1) - _band_base(L-2).

    Outputs (per problem row):
      ops  [B, NL] int8  — alignment ops COMPACTED right-anchored: the
           m-th emitted op (backtrack emits the LAST forward step first)
           lands at lane NL-1-m, so lanes [NL-nsteps, NL) read
           left-to-right are the forward alignment with no PAD holes.
           This is the key to the scatter-free update_step: forward step
           p (0-based) IS profile column p, so the profile update is a
           gather at lane p + NL - nsteps — the old level-indexed layout
           forced an XLA scatter (measured 57 ms/round vs the DP's 11,
           evals/msa_micro.py round 4).
      nst  [B, 1] int32  — total steps emitted (= new profile width).
      tch  [B, 1] int32  — band-touch flag: path reached within 8 of the
           |c-j| band edge (wb = WP - 8); always 0 for the full kernel.
           Replaces the separate touch_step dispatch."""
    jax, jnp, pl, pltpu = _modules()
    W = T if WP is None else WP
    wb = 0 if WP is None else WP - 8

    def kernel(dirs_ref, qlen_ref, ncol_ref,
               ops_ref, nst_ref, tch_ref,
               j_ref, c_ref, mode_ref, m_ref):
        tick = pl.program_id(1)
        B = qlen_ref.shape[0]
        L = 2 * T - tick            # current level (j + c)
        ti = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
        if WP is not None:
            ti = ti + _band_base(jnp, jnp.maximum(L - 2, 0), T, WP)
        lnl = jax.lax.broadcasted_iota(jnp.int32, (B, NL), 1)

        @pl.when(tick == 0)
        def _init():
            j_ref[:] = qlen_ref[:]
            c_ref[:] = ncol_ref[:]
            mode_ref[:] = jnp.full((B, 1), -1, jnp.int32)
            m_ref[:] = jnp.zeros((B, 1), jnp.int32)
            ops_ref[:] = jnp.full((B, NL), OP_PAD, jnp.int8)
            tch_ref[:] = jnp.zeros((B, 1), jnp.int32)

        j = j_ref[:]
        c = c_ref[:]
        mode = mode_ref[:]
        m = m_ref[:]
        act = (j + c == L) & ((j > 0) | (c > 0))
        at_top = j == 0
        at_left = c == 0

        val = jnp.sum(
            jnp.where(ti == c - 1, dirs_ref[0].astype(jnp.int32), 0),
            axis=1, keepdims=True)
        d = val & 3
        icont1 = (val >> 2) & 1
        fcont1 = (val >> 3) & 1
        isel2 = (val >> 4) & 1
        fsel2 = (val >> 5) & 1
        icont2 = (val >> 6) & 1
        fcont2 = (val >> 7) & 1
        # mode: -1 fresh; 1 = I run track 1; 2 = D run track 1;
        #        3 = I run track 2; 4 = D run track 2  (runs commit to a
        # track at entry — the convex model's per-run min)
        in_run = mode > 0
        run_is_i = in_run & ((mode == 1) | (mode == 3))
        run_is_d = in_run & ((mode == 2) | (mode == 4))
        sel = jnp.where(run_is_i, 1, jnp.where(run_is_d, 2, d))
        sel = jnp.where(at_top, 2, jnp.where(at_left, 1, sel))
        is_m = sel == 0
        is_i = sel == 1
        is_d = sel == 2
        op = jnp.where(is_m, OP_M, jnp.where(is_i, OP_I, OP_D))

        ops_ref[:] = jnp.where(
            act & (lnl == NL - 1 - m), op.astype(jnp.int8), ops_ref[:])
        if wb > 0:
            # post-step coordinates of the forward step emitted this tick
            # — the same set touch_step used to reconstruct from cumsums
            tch_ref[:] = jnp.where(
                act & (jnp.abs(c - j) >= wb - 8), 1, tch_ref[:])
        # track of the current step: run keeps its entry track; a fresh
        # I/D step picks by isel2/fsel2 of this cell
        i_trk2 = jnp.where(in_run, (mode == 3).astype(jnp.int32), isel2)
        d_trk2 = jnp.where(in_run, (mode == 4).astype(jnp.int32), fsel2)
        icont = jnp.where(i_trk2 == 1, icont2, icont1)
        fcont = jnp.where(d_trk2 == 1, fcont2, fcont1)
        nmode = jnp.where(
            is_m, -1,
            jnp.where(
                is_i,
                jnp.where(icont == 1, jnp.where(i_trk2 == 1, 3, 1), -1),
                jnp.where(fcont == 1, jnp.where(d_trk2 == 1, 4, 2), -1)))
        j_ref[:] = jnp.where(act, j - jnp.where(is_m | is_i, 1, 0), j)
        c_ref[:] = jnp.where(act, c - jnp.where(is_m | is_d, 1, 0), c)
        mode_ref[:] = jnp.where(act, nmode, mode)
        m2 = m + act.astype(jnp.int32)
        m_ref[:] = m2
        nst_ref[:] = m2

    return kernel


# ------------------------------------------------------------ jit steps --


def _build_jits(match: int, mismatch: int, gap_open: int, gap_ext: int,
                gap_open2: int, gap_ext2: int):
    jax, jnp, _, _ = _modules()
    oi = SCALE * gap_open
    ei = SCALE * gap_ext
    od = SCALE * gap_open
    oi2 = SCALE * gap_open2
    ei2 = SCALE * gap_ext2
    od2 = SCALE * gap_open2

    @jax.jit
    def gather_step(units_dev, ulen_dev, nunits, k):
        """Round-k unit gather, kept OUT of the fused round so the
        U-dimension (units_dev.shape[1], which varies per region batch)
        never appears in the Mosaic-bearing executable's shapes."""
        active = k < nunits
        unit_k = jnp.take(units_dev, k, axis=1).astype(jnp.int32)
        qlen_k = jnp.where(active, jnp.take(ulen_dev, k, axis=1), 1
                           ).astype(jnp.int32)
        return unit_k, qlen_k, active

    @functools.partial(jax.jit, static_argnames=("lqplus",))
    def scores_step(counts, n_placed, ncol, unit_k, lqplus):
        """Substitution scores + deletion prefix sums from counts, plus
        the round's unit padded into the DP's query buffer.  counts
        arrives int16 (base counts <= n units; the whole-pipeline cap is
        32k units/region) — the fixed-point score arithmetic widens it
        here, and halving the counts tensor's bytes nearly halves the
        gather-bound update_step (measured 5 ms of the 10.8 ms round,
        evals/hw_r05/msa_micro.log)."""
        counts = counts.astype(jnp.int32)
        B, T, _ = counts.shape
        ci = jnp.arange(T)[None, :]
        occ = counts.sum(axis=2)
        occ1 = jnp.maximum(occ, 1)
        raw = SCALE * ((match + mismatch) * counts
                       - mismatch * occ1[:, :, None])
        sub = jnp.floor_divide(raw, occ1[:, :, None])      # [B, T, 5]
        sub = jnp.where((ci < ncol[:, None])[:, :, None], sub, -SCALE * 64)
        sub = jnp.transpose(sub, (0, 2, 1)).astype(jnp.int32)  # [B, 5, T]
        wdel = jnp.floor_divide(SCALE * gap_ext * occ,
                                jnp.maximum(n_placed, 1)[:, None])
        wdel = jnp.where(ci < ncol[:, None], wdel, 0).astype(jnp.int32)
        wl = jnp.cumsum(wdel, axis=1).astype(jnp.int32)
        wdel2 = jnp.floor_divide(SCALE * gap_ext2 * occ,
                                 jnp.maximum(n_placed, 1)[:, None])
        wdel2 = jnp.where(ci < ncol[:, None], wdel2, 0).astype(jnp.int32)
        wl2 = jnp.cumsum(wdel2, axis=1).astype(jnp.int32)
        qbuf = jnp.pad(unit_k, ((0, 0), (0, lqplus - T)), constant_values=4)
        return sub, wdel, wl, wdel2, wl2, qbuf

    @jax.jit
    def update_step(counts, n_placed, ncol, overflow, unit, qlen, active,
                    ops_c, nst):
        """Profile update from the COMPACTED right-anchored ops (see
        _make_bt_kernel): forward step p is at lane p + NP - nsteps, and
        because new column index == step index, the whole update is
        gathers + masks — zero scatters.  Bit-identical to the retired
        level-indexed scatter formulation (dest = step-1 was a cumsum, so
        the scatter indices were unique and ascending = a compaction)."""
        B, T, _ = counts.shape
        NP = ops_c.shape[1]
        unit = unit.astype(jnp.int32)
        posT = jnp.arange(T)[None, :]
        src = posT + (NP - nst)                                  # nst [B,1]
        op = jnp.take_along_axis(
            ops_c, jnp.clip(src, 0, NP - 1), axis=1).astype(jnp.int32)
        valid = (posT < nst) & active[:, None]
        is_i = op == OP_I
        is_d = op == OP_D
        consumes_c = valid & ~is_i
        consumes_q = valid & ~is_d
        col = jnp.cumsum(consumes_c.astype(jnp.int32), axis=1)   # 1-based
        qp = jnp.cumsum(consumes_q.astype(jnp.int32), axis=1) - 1

        base = jnp.take_along_axis(
            unit, jnp.clip(qp, 0, unit.shape[1] - 1), axis=1)
        base = jnp.where(consumes_q, base, 5)
        onehot = jax.nn.one_hot(base, 5, dtype=jnp.int16)        # [B, T, 5]

        colz = jnp.clip(col - 1, 0, T - 1)
        # The counts relayout old[p] = counts[col(p)-1].  Two dead-end
        # reformulations are recorded in evals/hw_r05: a one-hot-matmul
        # (einsum over a [B,T,T] selection plane — ties the gather,
        # msa_micro_d.log, and its operand scales to GBs at T=4096) and a
        # vmapped lax.gather with contiguous (1,5) slices + sorted hints
        # (also ties).  What DOES beat the gather: the shift amount
        # p - (col(p)-1) equals the I-step prefix count — nondecreasing
        # and bounded by the round's insertions (~err/3 * qlen, tens) —
        # so a shift-accumulate loop over k = 0..K is K cheap elementwise
        # passes instead of an XLA gather.  Guarded: pathological K falls
        # back to the gather.
        kmap = jnp.where(consumes_c, posT - colz, 0)
        kmax = jnp.max(kmap)

        def _relayout_shift(_):
            def body(state):
                k, acc, shifted = state
                sel = consumes_c & (kmap == k)
                acc = jnp.where(sel[:, :, None], shifted, acc)
                return k + 1, acc, jnp.roll(shifted, 1, axis=1)

            _, acc, _ = jax.lax.while_loop(
                lambda s: s[0] <= kmax, body,
                (jnp.int32(0), jnp.zeros_like(counts), counts))
            return acc

        def _relayout_gather(_):
            g = jnp.take_along_axis(counts, colz[:, :, None], axis=1)
            return jnp.where(consumes_c[:, :, None], g, jnp.int16(0))

        if os.environ.get("TH_MSA_SHIFT", "") == "0":   # A/B knob
            old = _relayout_gather(None)
        else:
            old = jax.lax.cond(kmax <= 64, _relayout_shift,
                               _relayout_gather, operand=None)
        new = old + jnp.where(valid[:, :, None], onehot, jnp.int16(0))

        nsteps = nst[:, 0]
        counts2 = jnp.where(active[:, None, None], new, counts)
        ncol2 = jnp.where(active, jnp.minimum(nsteps, T), ncol)
        overflow2 = overflow | (active & (nsteps > T))
        n_placed2 = n_placed + active.astype(jnp.int32)
        return counts2, n_placed2, ncol2, overflow2

    @jax.jit
    def polish_update(votes, ncol, active, unit, ops_c, nst):
        """Frozen-layout vote accumulation: only M steps into existing
        columns count (the host polish rule, ops/poa_profile.py
        profile_consensus polish loop).  Realigns the compacted ops to
        forward order over the FULL width (steps past position T can
        still vote into columns < T when insertions pushed them there);
        dest = col stays a scatter — polish is off on the production
        default path, so this keeps the simple, known-correct form."""
        B, T, _ = votes.shape
        NP = ops_c.shape[1]
        pos = jnp.arange(NP)[None, :]
        srcl = pos + (NP - nst)
        op = jnp.take_along_axis(
            ops_c, jnp.clip(srcl, 0, NP - 1), axis=1).astype(jnp.int32)
        unit = unit.astype(jnp.int32)
        valid = (pos < nst) & active[:, None]
        consumes_c = valid & (op != OP_I)
        consumes_q = valid & (op != OP_D)
        col = jnp.cumsum(consumes_c.astype(jnp.int32), axis=1) - 1
        qp = jnp.cumsum(consumes_q.astype(jnp.int32), axis=1) - 1
        is_m = valid & (op == OP_M)
        base = jnp.take_along_axis(
            unit, jnp.clip(qp, 0, unit.shape[1] - 1), axis=1)
        onehot = jax.nn.one_hot(
            jnp.where(is_m, base, 5), 5, dtype=jnp.int16)
        dest = jnp.where(is_m & (col < T), col, T)
        bidx = jnp.broadcast_to(
            jnp.arange(B)[:, None], dest.shape)
        padded = jnp.zeros((B, T + 1, 5), jnp.int16)
        padded = padded.at[bidx, dest].add(onehot)
        return votes + padded[:, :T, :]

    @jax.jit
    def init_step(units_dev, ulen_dev):
        """Initial profile = one-hot of unit 0 (device-side: the counts
        tensor is ~8 MB int32 and the tunnel moves ~40 MB/s, so building
        it on host and pushing it cost more than the whole DP round)."""
        B, _, T = units_dev.shape
        ci = jnp.arange(T)[None, :]
        first = units_dev[:, 0, :].astype(jnp.int32)
        fl = ulen_dev[:, 0]
        oh = jax.nn.one_hot(first, 5, dtype=jnp.int16)
        counts = jnp.where(
            (ci < fl[:, None])[:, :, None], oh, jnp.int16(0))
        return counts, fl.astype(jnp.int32)

    @jax.jit
    def consensus_step(counts, n_placed, ncol, overflow, ev):
        """Packs (best | keep<<3 | overflow<<4 | ev<<5 | coverage<<8)
        into ONE int32 plane: the pull is dominated by tunnel round
        trips (~24 ms each), so one array beats the retired three
        (uint8 flags + int16 coverage + int32 ev)."""
        counts = counts.astype(jnp.int32)
        B, T, _ = counts.shape
        ci = jnp.arange(T)[None, :]
        best = jnp.argmax(counts, axis=2)
        bc = jnp.max(counts, axis=2)
        occ = counts.sum(axis=2)
        gaps = n_placed[:, None] - occ
        keep = (bc > gaps) & (ci < ncol[:, None])
        return (best
                | jnp.where(keep, 8, 0)
                | jnp.where(overflow[:, None], 16, 0)
                | jnp.left_shift(ev, 5)[:, None]
                | jnp.left_shift(bc, 8)).astype(jnp.int32)

    @jax.jit
    def consensus_step16(counts, n_placed, ncol, overflow, ev):
        """int16 variant (coverage field in bits 7-14, max 255 < 2^15):
        halves the per-batch pull bytes over the ~20-40 MB/s tunnel.
        Callers use it only when every region has <= 255 units, so the
        coverage (<= units placed) can't clip."""
        counts = counts.astype(jnp.int32)
        B, T, _ = counts.shape
        ci = jnp.arange(T)[None, :]
        best = jnp.argmax(counts, axis=2)
        bc = jnp.max(counts, axis=2)
        occ = counts.sum(axis=2)
        gaps = n_placed[:, None] - occ
        keep = (bc > gaps) & (ci < ncol[:, None])
        return (best
                | jnp.where(keep, 8, 0)
                | jnp.where(overflow[:, None], 16, 0)
                | jnp.left_shift(ev, 5)[:, None]
                | jnp.left_shift(bc, 7)).astype(jnp.int16)

    @jax.jit
    def unpack_step(units_p):
        """Unpack the 2-bases-per-byte upload (values 0..4 in each
        nibble): units cross the ~40 MB/s tunnel at half width."""
        B, U, Th = units_p.shape
        lo = units_p & 15
        hi = units_p >> 4
        return jnp.stack([lo, hi], axis=-1).reshape(B, U, Th * 2)

    return (gather_step, scores_step, update_step, consensus_step,
            consensus_step16, init_step, polish_update, unpack_step,
            (oi, ei, od, oi2, ei2, od2))


# --------------------------------------------------------------- driver --


def _tile_bt(T: int, W=None) -> int:
    """Rows per grid block, from the DP kernel's real VMEM bill (int32,
    x4B): qbuf ~2T+256, sub 5T, wl/wdel/wl2/wdel2 4T, 8 DP scratch refs
    of the working width (+9 cached-window refs in the banded variant),
    plus the double-buffered K-row uint8 dirs block; budget 12 MB of the
    16 MB VMEM.  W=None = full kernel (working width T)."""
    lanes = T if W is None else W
    bill = 44 * T + (40 if W is None else 76) * lanes + 512
    return max(8, 12_000_000 // bill // 8 * 8)


def _dirs_b(T: int, W=None) -> int:
    """Region batch per (bucket, window) variant = ONE VMEM tile, capped
    at 256 rows.  Larger region sets loop over tile-sized batches: all
    rounds of all batches enqueue asynchronously (measured ~0.4 ms of
    host dispatch per round vs ~10 ms of device DP), so extra batches
    cost only milliseconds while a big fixed B pads dead rows through
    EVERY unit round — the retired near-1024 B padded 512-region bench
    chunks by 27%.  256 divides the common pow2 chunk sizes exactly."""
    bt = min(_tile_bt(T, W), 256)
    if _B_CAP is not None:
        return max(8, min(bt, max(8, _B_CAP)))
    return bt




class DeviceMSA:
    """Batched profile-POA over fixed (T, B) shapes; one pull per batch."""

    def __init__(self, match, mismatch, gap_open, gap_ext, polish=0,
                 buckets=(128, 256, 384, 512, 640, 768, 896, 1024,
                          2048, 4096), mesh=None,
                 gap_open2=None, gap_ext2=None):
        """Buckets are fine-grained below 1024 (DP cost ~2*T^2, so a
        spill pays the full ratio) and coarse above (the banded kernels
        bound rows by the actual qlen+ncol and lanes by the band window,
        so a 1100-column region in the 2048 bucket costs barely more
        than in a 1280 one — and each bucket's Mosaic compile is seconds
        on this platform). Kernels compile on first use only.

        polish: frozen-layout refinement rounds after the sequential pass
        (bit-exact with profile_consensus(..., polish=polish))."""
        self.buckets = tuple(sorted(buckets))
        self.polish = polish
        # 1-D 'dp' mesh: region batches shard over it; each chip runs the
        # fused round's pallas kernels on its own shard under
        # jax.shard_map (no collectives: regions are independent, the
        # reference's pthread fan-out role per SURVEY §5.8)
        self.mesh = mesh
        self.mesh_n = 1 if mesh is None else int(mesh.devices.size)
        if gap_open2 is None:
            # single-affine callers: track 2 strictly dominated (same
            # extension, open too large to ever win within one bucket)
            gap_open2 = gap_open + gap_ext * (2 * self.buckets[-1] + 2)
            gap_ext2 = gap_ext
        (self.gather_step, self.scores_step, self.update_step,
         self.consensus_step, self.consensus_step16, self.init_step,
         self.polish_update, self.unpack_step,
         (self.oi, self.ei, self.od, self.oi2, self.ei2, self.od2)
         ) = _build_jits(
            match, mismatch, gap_open, gap_ext, gap_open2, gap_ext2)
        self._dp_runs: Dict[int, object] = {}
        self._bt_runs: Dict[int, object] = {}
        self._round_fns: Dict[int, object] = {}
        # concurrent drive waves (engine TH_DRIVE_WAVES) may request the
        # same (T, W, Bs) variant from two threads; build under a lock so
        # each Mosaic kernel compiles once
        import threading

        self._build_lock = threading.Lock()

    def _bucket(self, n: int):
        for b in self.buckets:
            if n <= b:
                return b
        return None

    def _sub_b(self, n: int, T: int, W=None) -> int:
        """Per-shard region-batch rows for n regions: pow2-of-8 rungs up
        to the _dirs_b cap.  The fixed cap padded a 5-region bucket batch
        to 256 rows through EVERY unit round — on test.fq (38 regions
        spread over ~8 bucket/rung batches) the MSA stage was half the
        chunk wall at ~2% row utilization (evals/hw_r05/testfq_stages)."""
        cap = _dirs_b(T, W)
        per = -(-max(1, n) // self.mesh_n)
        b = 8
        while b < per:
            b *= 2
        return min(b, cap)

    def _dp_run(self, T: int, W: int | None = None, Bs: int | None = None):
        key = (T, W, Bs)
        if key in self._dp_runs:
            return self._dp_runs[key]
        jax, jnp, pl, pltpu = _modules()
        K = 4
        B = Bs if Bs is not None else _dirs_b(T, W)
        BT = min(B, _tile_bt(T, W))  # B is a BT multiple by construction
        n_rows = 2 * T - 1
        NR = (n_rows + K - 1) // K
        LQplus = ((n_rows + 127) // 128) * 128 + 128
        if W is not None:
            WP = W
            kern = _make_dp_kernel_banded(
                T, K, W, self.oi, self.ei, self.od,
                self.oi2, self.ei2, self.od2)
        else:
            WP = T
            kern = _make_dp_kernel(T, K, self.oi, self.ei, self.od,
                                   self.oi2, self.ei2, self.od2)

        @jax.jit
        def run(maxr, qbuf, sub, wl, wdel, wl2, wdel2, qlen, ncol):
            row = pl.BlockSpec((BT, T), lambda b, r: (b, 0),
                               memory_space=pltpu.VMEM)
            return pl.pallas_call(
                kern,
                grid=(B // BT, NR),
                in_specs=[
                    pl.BlockSpec((1, 1), lambda b, r: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((BT, LQplus), lambda b, r: (b, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((BT, 5, T), lambda b, r: (b, 0, 0),
                                 memory_space=pltpu.VMEM),
                    row, row, row, row,
                    pl.BlockSpec((BT, 1), lambda b, r: (b, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((BT, 1), lambda b, r: (b, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (K, BT, WP), lambda b, r: (r, b, 0),
                    memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((NR * K, B, WP), jnp.uint8),
                scratch_shapes=[pltpu.VMEM((BT, WP), jnp.int32)
                                for _ in range(8 if W is None else 17)],
                interpret=INTERPRET,
            )(maxr, qbuf, sub, wl, wdel, wl2, wdel2, qlen, ncol)

        self._dp_runs[key] = (run, B, LQplus)
        return self._dp_runs[key]

    def _bt_run(self, T: int, W: int | None = None,
                Bs: int | None = None):
        key = (T, W, Bs)
        if key in self._bt_runs:
            return self._bt_runs[key]
        jax, jnp, pl, pltpu = _modules()
        B = Bs if Bs is not None else _dirs_b(T, W)
        BT = min(B, _tile_bt(T, W))
        NL = ((2 * T + 1 + 127) // 128) * 128
        NT = 2 * T          # levels L = 2T .. 1 (L=1: boundary-only steps)
        kern = _make_bt_kernel(T, NL, W)
        W = T if W is None else W

        @jax.jit
        def run(dirs, qlen, ncol):
            small = pl.BlockSpec((BT, 1), lambda b, k: (b, 0),
                                 memory_space=pltpu.VMEM)
            return pl.pallas_call(
                kern,
                grid=(B // BT, NT),
                in_specs=[
                    pl.BlockSpec(
                        (1, BT, W),
                        lambda b, k: (jnp.maximum(2 * T - 2 - k, 0), b, 0),
                        memory_space=pltpu.VMEM),
                    small,
                    small,
                ],
                out_specs=[
                    pl.BlockSpec((BT, NL), lambda b, k: (b, 0),
                                 memory_space=pltpu.VMEM),
                    small,
                    small,
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((B, NL), jnp.int8),
                    jax.ShapeDtypeStruct((B, 1), jnp.int32),
                    jax.ShapeDtypeStruct((B, 1), jnp.int32),
                ],
                scratch_shapes=[pltpu.VMEM((BT, 1), jnp.int32)
                                for _ in range(4)],
                interpret=INTERPRET,
            )(dirs, qlen, ncol)

        self._bt_runs[key] = (run, B, NL)
        return self._bt_runs[key]

    def _round(self, T: int, W: int | None = None,
               Bs: int | None = None):
        """Fused unit round (scores + DP + backtrack + update) as ONE jit:
        nested jits inline, so each round is a single dispatch instead of
        four. k arrives as a traced scalar — no per-k recompile.

        W set swaps in the W-lane windowed DP/backtrack and threads an
        `ev` first-event state through the rounds: per region, 0 = clean,
        1 = the path of some unit touched the band edge, 2 = the profile
        overflowed the bucket — recording whichever happened FIRST (and
        touch before overflow within one round), which is exactly the
        order the sequential host oracle (banded_profile_consensus)
        encounters them, so the driver's retry walk matches the host's
        bit-for-bit.

        Bs: per-shard region rows (pow2 sub-shape from _sub_b); None =
        the _dirs_b cap."""
        key = (T, W, Bs)
        if key in self._round_fns:
            return self._round_fns[key]
        with self._build_lock:
            return self._round_locked(key, T, W, Bs)

    def _round_locked(self, key, T, W, Bs):
        if key in self._round_fns:   # built while waiting on the lock
            return self._round_fns[key]
        jax, jnp, _, _ = _modules()
        banded = W is not None
        run_dp, B, LQplus = self._dp_run(T, W, Bs)
        run_bt, B2, NL = self._bt_run(T, W, Bs)
        assert B == B2

        def round_fn(counts, n_placed, ncol, overflow, ev,
                     unit_k, qlen_k, active):
            sub, wdel, wl, wdel2, wl2, qbuf = self.scores_step(
                counts, n_placed, ncol, unit_k, lqplus=LQplus)
            maxr = jnp.max(qlen_k + ncol).reshape(1, 1)
            dirs = run_dp(maxr, qbuf, sub, wl, wdel, wl2, wdel2,
                          qlen_k.reshape(-1, 1), ncol.reshape(-1, 1))
            ops_c, nst, tchk = run_bt(dirs, qlen_k.reshape(-1, 1),
                                      ncol.reshape(-1, 1))
            counts2, n_placed2, ncol2, overflow2 = self.update_step(
                counts, n_placed, ncol, overflow, unit_k, qlen_k, active,
                ops_c, nst)
            if banded:
                tch = (tchk[:, 0] > 0) & active
                ovf_new = overflow2 & ~overflow
                ev = jnp.where(
                    ev != 0, ev,
                    jnp.where(tch, 1, jnp.where(ovf_new, 2, 0)))
            return counts2, n_placed2, ncol2, overflow2, ev

        def polish_round_fn(votes, counts, n_placed, ncol, ev,
                            unit_k, qlen_k, active):
            sub, wdel, wl, wdel2, wl2, qbuf = self.scores_step(
                counts, n_placed, ncol, unit_k, lqplus=LQplus)
            maxr = jnp.max(qlen_k + ncol).reshape(1, 1)
            dirs = run_dp(maxr, qbuf, sub, wl, wdel, wl2, wdel2,
                          qlen_k.reshape(-1, 1), ncol.reshape(-1, 1))
            ops_c, nst, tchk = run_bt(dirs, qlen_k.reshape(-1, 1),
                                      ncol.reshape(-1, 1))
            votes2 = self.polish_update(votes, ncol, active, unit_k,
                                        ops_c, nst)
            if banded:
                tch = (tchk[:, 0] > 0) & active
                ev = jnp.where(ev != 0, ev, jnp.where(tch, 1, 0))
            return votes2, ev

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            s = NamedSharding(self.mesh, P("dp"))

            def _smap(fn, n_in, n_out):
                m = jax.shard_map(
                    fn, mesh=self.mesh,
                    in_specs=(P("dp"),) * n_in,
                    out_specs=(P("dp"),) * n_out if n_out > 1 else P("dp"),
                    check_vma=False,
                )
                return jax.jit(
                    m, in_shardings=(s,) * n_in,
                    out_shardings=(s,) * n_out if n_out > 1 else s,
                )

            round_fn = _smap(round_fn, 8, 5)
            polish_round_fn = _smap(polish_round_fn, 8, 2)
        else:
            round_fn = jax.jit(round_fn)
            polish_round_fn = jax.jit(polish_round_fn)

        self._round_fns[key] = (round_fn, polish_round_fn,
                                B * self.mesh_n, LQplus, NL)
        return self._round_fns[key]

    def consensus_batch(
        self, regions: List[List[np.ndarray]]
    ) -> List[Tuple[np.ndarray, np.ndarray]]:
        """[(cons_bases, coverage)] per region, host fallback marked None
        (caller resolves those with the host oracle)."""
        import jax.numpy as jnp

        out: List = [None] * len(regions)
        # (region index, min bucket, band-ladder rung)
        todo: List[Tuple[int, int, int]] = []
        spread = [0] * len(regions)
        for ri, units in enumerate(regions):
            cap = max(len(u) for u in units)
            spread[ri] = cap - min(len(u) for u in units)
            # 1.2x column-growth margin (measured profile growth on
            # 10%-error R2C2 units: mean 1.15, max 1.17); a region whose
            # profile outgrows its bucket overflows and retries one bucket
            # up (below), so the margin can stay tight — T^2 DP cost and
            # the finer bucket ladder reward it
            todo.append((ri, int(cap * 1.2) + 8, 0))

        from ..utils.metrics import METRICS

        while todo:
            by_bucket: Dict[Tuple[int, int | None], List[int]] = {}
            for ri, need, rung in todo:
                b = self._bucket(need)
                if b is not None:
                    rungs = band_ladder(b, spread[ri])
                    W = rungs[min(rung, len(rungs) - 1)]
                    by_bucket.setdefault((b, W), []).append((ri, rung))
            todo = []
            # Two phases: enqueue EVERY batch's rounds (all async), then
            # pull.  A per-batch blocking pull would idle the device for
            # one tunnel round trip between batches.
            launched = []
            with METRICS.timed("msa_enqueue"):
                for (T, W), entries in by_bucket.items():
                    lo = 0
                    while lo < len(entries):
                        Bs = self._sub_b(len(entries) - lo, T, W)
                        round_fn, polish_round_fn, B, LQplus, NL = \
                            self._round(T, W, Bs)
                        part = entries[lo:lo + B]
                        devs = self._enqueue_batch(
                            [regions[i] for i, _ in part], T, B,
                            round_fn, polish_round_fn, jnp, W)
                        launched.append((part, T, W, devs))
                        lo += B
            with METRICS.timed("msa_pull"):
                # start every batch's device->host copy before blocking on
                # the first: the pull was round-trip-bound (~24 ms per
                # batch over the tunnel, VERDICT r4 weak #3), so
                # overlapping the copies collapses k round trips into ~1
                for _, _, _, devs in launched:
                    try:
                        devs.copy_to_host_async()
                    except AttributeError:  # non-Array (interpret paths)
                        pass
                for part, T, W, devs in launched:
                    res = self._collect_batch(devs, len(part), W)
                    for (i, rung), r in zip(part, res):
                        if r is None:
                            # overflow: bucket up, ladder restarts
                            METRICS.add("msa_retry_ovf")
                            todo.append((i, T + 1, 0))
                        elif isinstance(r, str):
                            # band touch: same bucket, next rung
                            METRICS.add("msa_retry_touch")
                            todo.append((i, T, rung + 1))
                        else:
                            out[i] = r
        return out

    def _enqueue_batch(self, regs, T, B, round_fn, polish_round_fn, jnp,
                       W=None):
        """Dispatches every unit round of one region batch; returns the
        still-on-device (packed, coverage, ev) arrays — no host pull."""
        from ..utils.metrics import METRICS

        banded = W is not None
        R = len(regs)
        # U only shapes the cheap gather/init jits (compiled per distinct
        # U, pure XLA); the Mosaic-bearing fused round is U-free
        U = max(len(units) for units in regs)
        units_arr = np.full((B, U, T), 4, np.uint8)
        ulen = np.zeros((B, U), np.int32)
        nunits = np.ones(B, np.int32)
        for i, units in enumerate(regs):
            nunits[i] = len(units)
            for k, u in enumerate(units):
                L = min(len(u), T)
                units_arr[i, k, :L] = u[:L]
                ulen[i, k] = max(1, L)

        # 2 bases/byte across the tunnel (T is a lane multiple, so even)
        units_pk = units_arr[:, :, 0::2] | (units_arr[:, :, 1::2] << 4)
        units_dev = self.unpack_step(jnp.asarray(units_pk))
        ulen_dev = jnp.asarray(ulen)
        counts, ncol = self.init_step(units_dev, ulen_dev)
        n_placed = jnp.ones(B, jnp.int32)
        overflow = jnp.zeros(B, bool)

        nunits_dev = jnp.asarray(nunits)
        ev = jnp.zeros(B, jnp.int32)
        max_units = int(nunits.max())
        # Gcell/s telemetry: each unit round sweeps a [B, T, band] DP
        METRICS.add(
            "msa_cells",
            float(B) * T * (W if banded else T)
            * (max_units - 1 + self.polish * max_units),
        )
        METRICS.add("msa_batches")
        for k in range(1, max_units):
            unit_k, qlen_k, active = self.gather_step(
                units_dev, ulen_dev, nunits_dev, k)
            counts, n_placed, ncol, overflow, ev = round_fn(
                counts, n_placed, ncol, overflow, ev,
                unit_k, qlen_k, active)

        nunits_dev32 = nunits_dev.astype(jnp.int32)
        for _ in range(self.polish):
            # frozen-layout refinement: the round reads the SAME counts
            # every k, so sub/wdel stay frozen while the unit gather walks
            # k = 0..max-1 (k=0 realigns the first unit too)
            votes = jnp.zeros_like(counts)
            for k in range(max_units):
                unit_k, qlen_k, active = self.gather_step(
                    units_dev, ulen_dev, nunits_dev, k)
                votes, ev = polish_round_fn(
                    votes, counts, n_placed, ncol, ev,
                    unit_k, qlen_k, active)
            counts = votes
            n_placed = nunits_dev32

        if int(nunits.max()) <= 255:
            return self.consensus_step16(counts, n_placed, ncol,
                                         overflow, ev)
        return self.consensus_step(counts, n_placed, ncol, overflow, ev)

    def _collect_batch(self, dev, R, W=None):
        banded = W is not None
        packed = np.asarray(dev)
        # coverage field position differs by pull width (consensus_step
        # int32: bits 8+; consensus_step16: bits 7+, cov <= 255)
        cov_shift = 7 if packed.dtype == np.int16 else 8
        out = []
        for i in range(R):
            row = packed[i]
            ev_i = (row[0] >> 5) & 3
            if banded and ev_i == 1:
                out.append("touch")     # band edge: next-rung retry
                continue
            if banded and ev_i == 2:
                out.append(None)        # overflow -> bucket-up retry
                continue
            if row[0] & 16:
                out.append(None)        # overflow -> bucket-up retry
                continue
            kp = (row & 8) != 0
            out.append(((row[kp] & 7).astype(np.uint8),
                        (row[kp] >> cov_shift).astype(np.int64)))
        return out
