"""Device chaining DP: batched, windowed, bit-exact with a fallback flag.

Re-expresses the reference chain DP (reference src/tandem_chain.c:290-356;
behavioral spec = ops/chaining.py `_run_dp`) as a masked fixed-window
predecessor scan over padded per-read hit matrices, sequential over hits
(`lax.scan`) and vectorized over the window and the batch.

Why this is exact and not a heuristic: with one hit per end position
(always true for this seeder — at most one self-hit is emitted per k-mer
occurrence) every end-group is a singleton, so the reference's
nearest-group-first scan is a flat backward scan over hit indices, and its
sequential pruning state is reconstructible in parallel:

* an "improvement" (a predecessor that updates the running max) happens
  exactly at the strict prefix maxima of the candidate-score sequence in
  scan order, because non-improving candidates never change the running
  max — so `improving` is a suffix-max comparison, not a serial walk;
* the `iter_n >= max_h` cutoff counts consecutive non-improving
  candidates, i.e. the distance to the most recent improvement — a
  suffix-min of improving indices;
* SAME/OVL stop events depend only on the candidate's class and its
  (parallel-computable) improving bit.

The first event in scan order — window-edge (`end < cur_start`), iter_n
cutoff, or a stop — truncates the candidate set; the final cell value is
the last improving candidate at or before the truncation (improving
scores are strictly increasing in scan order, so "last improving" is the
argmax with the reference's tie behavior built in).

If NO event fires inside the window, the sequential scan would have
continued past it: that read gets `fallback=True` and the caller reroutes
it through the host kernel (native/chainx.c). Same escape-hatch design as
the device seeder (ops/seeding_jax.py). Reads with non-singleton groups
or values outside the int32-safe envelope (period >= 2^15, end >= 2^30 —
the same gate as the native AVX path) are also flagged.

Exactness guarantee: with `window >= L` (the padded hit capacity) the
front pad's `end = NEG` lanes sit inside every window, so an event always
fires and `incomplete` can never be raised — every non-gated row is
bit-exact (verified against the oracle incl. `from` pointers on all
test_data reads plus the fuzz corpus, tests/test_chaining_jax.py). The
engine calls it this way, window == hit-bucket size.

Backtrack/top-chain selection/overlap dedup stay on the host
(native/chainx.c `th_chain_post`): they touch ~1-3 chains per read and
are control-flow-bound, exactly the split SURVEY.md §7 step 3 calls for.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

NEG = jnp.int32(-(1 << 30))
BIG = jnp.int32(1 << 30)


@functools.partial(jax.jit, static_argnames=("k", "window"))
def chain_dp_batch(
    ends: jnp.ndarray,
    periods: jnp.ndarray,
    n_hits: jnp.ndarray,
    *,
    k: int,
    window: int = 512,
):
    """Batched chain DP scores.

    ends, periods: [B, L] int32 per-read hit matrices sorted by
    (end, period) with INT32_MAX sentinels past n_hits — the layout
    ops/seeding_jax.collect_hits_batch emits.
    n_hits: [B] int32.

    Returns (score [B, L] int32, from_idx [B, L] int32 (-1 = none),
    fallback [B] bool). Rows with fallback=True hold garbage and must be
    rerouted through the host chainer.
    """
    B, L = ends.shape
    W = int(window)
    kk = jnp.int32(k)
    ends = ends.astype(jnp.int32)
    periods = periods.astype(jnp.int32)
    n_hits = n_hits.astype(jnp.int32)
    starts = ends - periods
    base = kk + jnp.minimum(kk, periods)

    idxL = jnp.arange(L, dtype=jnp.int32)[None, :]
    real = idxL < n_hits[:, None]
    # exactness gates (mirror of the native AVX gate in chainx.c):
    # singleton end-groups, periods < 2^15 (delta^2 fits int32), ends < 2^30
    nonsingleton = jnp.any(
        (ends[:, 1:] == ends[:, :-1]) & real[:, 1:], axis=1
    )
    gate = (
        nonsingleton
        | jnp.any(real & (periods >= (1 << 15)), axis=1)
        | jnp.any(real & (ends >= (1 << 30)), axis=1)
    )

    # front padding so every window slice is in-bounds; padded lanes have
    # end = NEG < any cur_start, i.e. they are the window-edge event
    padE = jnp.full((B, W), NEG, jnp.int32)
    endsP = jnp.concatenate([padE, ends], axis=1)
    startsP = jnp.concatenate([jnp.zeros((B, W), jnp.int32), starts], axis=1)
    scoreP0 = jnp.concatenate([jnp.zeros((B, W), jnp.int32), base], axis=1)

    idxW = jnp.arange(W, dtype=jnp.int32)[None, :]  # lane w: p = cur - W + w

    def step(scoreP, cur):
        # (cells at cur >= n_hits[row] are computed but never consumed:
        # every caller slices row outputs to [:n_hits]; the while_loop
        # below therefore stops at the batch-wide max n_hits instead of
        # sweeping all L padded columns)
        # cur-cell fields [B, 1]
        ce = lax.dynamic_slice_in_dim(endsP, cur + W, 1, axis=1)
        cs = lax.dynamic_slice_in_dim(startsP, cur + W, 1, axis=1)
        base_cur = lax.dynamic_slice_in_dim(scoreP, cur + W, 1, axis=1)
        cp = ce - cs
        # predecessor window [B, W]: lanes p = cur-W .. cur-1
        ew = lax.dynamic_slice_in_dim(endsP, cur, W, axis=1)
        sw = lax.dynamic_slice_in_dim(startsP, cur, W, axis=1)
        scw = lax.dynamic_slice_in_dim(scoreP, cur, W, axis=1)

        pre_p = ew - sw
        valid = ew >= cs
        # get_con_score (tandem_chain.c:151-166); 5/9 integer ratio test is
        # exact for periods < 2^26 (see native/chainx.c:75-78)
        conn = valid & (cs > sw) & (5 * cp < 9 * pre_p) & (5 * pre_p < 9 * cp)
        dis1 = ce - ew          # >= 1 on conn lanes (ends strictly increase)
        dis2 = cs - sw          # >= 1 on conn lanes
        matched = jnp.minimum(dis1, kk) + jnp.minimum(dis2, kk)
        dlt = jnp.abs(cp - pre_p)
        ds = jnp.maximum(dis1 + dis2, 1)
        ilog2 = jnp.int32(31) - lax.clz(ds)
        gap = ((dlt * dlt) >> 1) + (ilog2 >> 1)
        sc = jnp.where(conn, scw + matched - gap, NEG)

        # improving = strict prefix maxima in scan order (descending w),
        # seeded with the cell's init score
        suff_incl = lax.cummax(sc[:, ::-1], axis=1)[:, ::-1]
        suff_excl = jnp.concatenate(
            [suff_incl[:, 1:], jnp.full((B, 1), NEG, jnp.int32)], axis=1
        )
        improving = conn & (sc > jnp.maximum(base_cur, suff_excl))

        # iter_n at lane w = distance to the most recent improvement
        # (suffix-min of improving lane indices)
        mi = lax.cummin(
            jnp.where(improving, idxW, BIG)[:, ::-1], axis=1
        )[:, ::-1]
        run = jnp.where(mi < BIG, mi - idxW, W - idxW)
        iterbrk = run >= cp  # max_h = cur period (tandem_chain.c:329)

        # stop events: OVL always stops; SAME stops only when improving
        stop = conn & (dlt == 0) & ((matched < 2 * kk) | improving)

        event = stop | iterbrk | (~valid)
        wT = jnp.max(jnp.where(event, idxW, -1), axis=1, keepdims=True)
        include = (idxW > wT) | ((idxW == wT) & stop & improving)
        cand = include & improving
        # winner: the LAST improvement in scan order = min lane index
        w_win = jnp.min(jnp.where(cand, idxW, BIG), axis=1, keepdims=True)
        has = w_win < BIG
        sc_win = jnp.take_along_axis(sc, jnp.minimum(w_win, W - 1), axis=1)
        new_score = jnp.where(has, sc_win, base_cur)
        new_from = jnp.where(has, cur - W + w_win, -1)
        incomplete = wT < 0  # no event inside the window: not provably exact

        scoreP = lax.dynamic_update_slice_in_dim(
            scoreP, new_score, cur + W, axis=1
        )
        return scoreP, (new_from[:, 0], incomplete[:, 0])

    maxcur = jnp.max(n_hits)

    def cond(state):
        cur, _, _, _ = state
        return cur < maxcur

    def body(state):
        cur, scoreP, from_all, inc = state
        scoreP, (new_from, incomplete) = step(scoreP, cur)
        from_all = lax.dynamic_update_slice_in_dim(
            from_all, new_from[:, None], cur, axis=1)
        inc = inc | (incomplete & (cur < n_hits))
        return cur + 1, scoreP, from_all, inc

    _, scoreP, from_idx, inc = lax.while_loop(
        cond, body,
        (jnp.int32(1), scoreP0,
         jnp.full((B, L), -1, jnp.int32), jnp.zeros(B, bool)),
    )
    score = scoreP[:, W:]
    fallback = gate | inc
    return score, from_idx, fallback
