"""Fused device seed+chain offload with packed tunnel formats.

Round-4 measured the naive device offload (separate seed + chain
dispatches, full-width int32 pulls) at 4.7 + 2.2 ms/read vs the host
path's 0.45 (evals/hw_r04/ab_offload_and_chunk.log config C); the round-5
micro-profile (evals/hw_r05/seed_chain_micro.log) decomposed that into
upload 0.88 (the tunnel pushes at ~12 MB/s), seed-sort 0.86 (4-operand
lexicographic sort over 2L records), full hits pull 2.9, chain 1.56
(window = full hit capacity).  This module attacks each measured term:

  * upload: reads cross the tunnel at 4 bases/byte (2-bit codes; rows
    containing N are flagged host-side and rerouted to the exact host
    seeder, reference semantics are N-reset anyway, tandem_hit.c:42-44)
  * seed: ops/seeding_jax.collect_hits_packed — single-uint32-key sort +
    branchless binary search (the host oracle's own searchsorted
    dataflow) instead of the 2L-record merge
  * chain: ops/chaining_jax.chain_dp_batch with a while_loop bound at the
    batch max hit count and a narrow predecessor window (escalation:
    flagged rows reroute to the host chainer on the already-pulled hits)
  * pull: ONE uint32 plane for hits (end << pos_bits | period — also the
    (end, period) sort order, so it doubles as the compaction), ONE int32
    plane for the chain DP (score << shift | from-delta), one [B, 4] meta

Both kernels are row-independent, so under a 1-D 'dp' mesh the batch
shards over chips with zero collectives (the pthread fan-out role of
reference src/main.c:273-291).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import numpy as np

from .seeding import collect_tandem_repeat_hits
from .seeding_jax import collect_hits_packed, packed_ok, pos_bits


# read-length ladder: pow2 plus 1.5x midpoints — the round-4 pow2-only
# rule padded 4.4 kb reads to 8192 (46% waste on every downstream term)
def len_bucket(n: int) -> int:
    L = 1024
    while L < n:
        L += L // 2 if (L & (L - 1)) == 0 else L // 3
    return L


def sf_shift(window: int) -> int:
    """Bits reserved for the from-delta field (delta in [0, window])."""
    return int(window).bit_length()


def supported(k: int, maxL: int, window: int = 512) -> bool:
    """Static gate for the fused path: the packed-key seeder must fit
    (packed_ok) and the chain score bound 2k * hit_cap must fit above the
    delta field of the score|delta plane."""
    L = len_bucket(maxL)
    return packed_ok(k, L) and (
        2 * k * (L // 2) < (1 << (31 - sf_shift(window)))
    )


@functools.lru_cache(maxsize=None)
def _fused(k: int, use_hpc: bool, min_p: int, max_p: int, w: int,
           L: int, hit_cap: int, window: int):
    """Builds the jitted fused dispatch for one static config."""
    import jax
    import jax.numpy as jnp

    from .chaining_jax import chain_dp_batch

    pb = pos_bits(L)
    pmask = jnp.int32((1 << pb) - 1)
    shift = sf_shift(window)

    @jax.jit
    def run(packed, length):
        B = packed.shape[0]
        b = packed
        bases = jnp.stack(
            [b & 3, (b >> 2) & 3, (b >> 4) & 3, (b >> 6) & 3], axis=-1
        ).reshape(B, L)
        idx = jnp.arange(L, dtype=jnp.int32)[None, :]
        bases = jnp.where(idx < length[:, None], bases, jnp.uint8(4))
        ph, n_hits, fb = collect_hits_packed(
            bases, length, k=k, use_hpc=use_hpc,
            min_p=min_p, max_p=max_p, w=w)
        phc = ph[:, :hit_cap]
        ends = (phc >> pb).astype(jnp.int32)
        periods = phc.astype(jnp.int32) & pmask
        ncl = jnp.minimum(n_hits, hit_cap)
        score, from_idx, fbc = chain_dp_batch(
            ends, periods, ncl, k=k, window=window)
        lane = jnp.arange(hit_cap, dtype=jnp.int32)[None, :]
        delta = jnp.where(from_idx >= 0, lane - from_idx, 0)
        sf = (score << shift) | delta
        meta = jnp.stack(
            [n_hits,
             fb.astype(jnp.int32),
             fbc.astype(jnp.int32),
             (n_hits > hit_cap).astype(jnp.int32)],
            axis=1,
        )
        return phc.astype(jnp.int32), sf, meta

    return run


def pack_reads(
    bseqs: List[Optional[np.ndarray]], B: int, L: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host packing: [B, L//4] uint8 (4 bases/byte), lengths, has-N flags.
    bseqs entries may be None (too-short reads) — left as zero rows."""
    arr = np.zeros((B, L), np.uint8)
    lens = np.zeros(B, np.int32)
    has_n = np.zeros(B, bool)
    for i, bs in enumerate(bseqs):
        if bs is None:
            continue
        n = len(bs)
        lens[i] = n
        if (bs >= 4).any():
            has_n[i] = True
            continue  # row reroutes to the host seeder; leave zeros
        arr[i, :n] = bs
    packed = (arr[:, 0::4] | (arr[:, 1::4] << 2)
              | (arr[:, 2::4] << 4) | (arr[:, 3::4] << 6))
    return packed, lens, has_n


def device_seed_chain(
    bseqs: List[Optional[np.ndarray]],
    mtp,
    mesh=None,
    window: int = 512,
):
    """Engine entry: one fused dispatch + one pull for a whole chunk.

    Returns (hits_list, chains_list) with the same contract as
    Engine._device_seed: hits_list[i] = (ends, periods) int64 arrays,
    chains_list[i] = (dp, chains) or None when the read must take the
    host chainer (it never is None here — fallbacks resolve inline).
    """
    import jax
    import jax.numpy as jnp

    from .chaining_native import tandem_chain_from_dp, tandem_chain_native
    from ..utils.metrics import METRICS

    n = len(bseqs)
    g = 64 * (1 if mesh is None else int(mesh.devices.size))
    B = max(g, -(-n // g) * g)
    maxL = max((len(b) for b in bseqs if b is not None), default=1)
    L = len_bucket(maxL)
    hit_cap = L // 2
    pb = pos_bits(L)
    pmask = (1 << pb) - 1
    shift = sf_shift(window)
    dmask = (1 << shift) - 1

    packed, lens, has_n = pack_reads(bseqs, B, L)
    args = (jnp.asarray(packed), jnp.asarray(lens))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        s = NamedSharding(mesh, P("dp"))
        args = tuple(jax.device_put(a, s) for a in args)
    run = _fused(mtp.k, bool(mtp.hpc), mtp.min_p, mtp.max_p, mtp.w,
                 L, hit_cap, window)
    ph_d, sf_d, meta_d = run(*args)
    ph, sf, meta = jax.device_get((ph_d, sf_d, meta_d))

    hits_list: List = [None] * n
    chains_list: List = [None] * n
    lanes = np.arange(hit_cap, dtype=np.int64)
    for i in range(n):
        if bseqs[i] is None:
            hits_list[i] = (np.zeros(0, np.int64), np.zeros(0, np.int64))
            chains_list[i] = (None, [])
            continue
        cnt, fb_seed, fb_chain, over = meta[i]
        if has_n[i] or fb_seed or over:
            METRICS.add("offload_seed_fb")
            e, p = collect_tandem_repeat_hits(
                bseqs[i], mtp.k, mtp.w, mtp.hpc, mtp.min_p, mtp.max_p)
            hits_list[i] = (e, p)
            chains_list[i] = tandem_chain_native(e, p, mtp.k)
            continue
        row = ph[i, :cnt].astype(np.int64)
        e = row >> pb
        p = row & pmask
        hits_list[i] = (e, p)
        if cnt < 2:
            chains_list[i] = (None, [])
        elif fb_chain:
            # chain window event never fired inside `window` for some
            # cell: exactness not provable — host chainer on the pulled
            # hits (cheap: one read)
            METRICS.add("offload_chain_fb")
            chains_list[i] = tandem_chain_native(e, p, mtp.k)
        else:
            srow = sf[i, :cnt].astype(np.int64)
            score = srow >> shift
            delta = srow & dmask
            from_idx = np.where(delta > 0, lanes[:cnt] - delta, -1)
            chains_list[i] = tandem_chain_from_dp(
                e, p, score, from_idx, mtp.k)
    return hits_list, chains_list
