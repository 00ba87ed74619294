"""Seeding: k-mer / minimizer hashing and tandem self-hit generation.

NumPy oracle with the exact semantics of the reference seeder
(reference src/tandem_hit.c:37-237):

  * direct hash (w=1): rolling 2-bit key over the last k bases, reset on N;
    one (key, rightmost-pos) seed per position once k bases accumulated
    (tandem_hit.c:37-56)
  * HPC: homopolymer runs compressed, the recorded position is the LAST
    base of each run (tandem_hit.c:46)
  * minimizer hash (w>1): minimap2-style queue over raw (unscrambled) keys
    with tie emission — the reference defines invertible hashes but never
    calls them (tandem_hit.c:12-34), so minima are raw-key minima
  * self-hits: seeds sorted by (key, pos); within a key group each
    occurrence pairs with its NEAREST earlier occurrence at distance
    >= min_p; kept iff that distance <= max_p; at most one hit per
    occurrence (tandem_hit.c:171-225)
  * hits returned sorted by (end, period) — the end:32|period:32 radix
    order (tandem_hit.c:223)

Everything here is sort/gather/searchsorted over flat arrays — the same
dataflow the JAX path (ops/seeding_jax.py) runs batched on device with
jax.lax.sort over padded per-read seed matrices.
"""

from __future__ import annotations

import numpy as np


def _hpc_compress(bseq: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Compress homopolymer runs keeping the run's last index.

    Ns are not merged with anything (the reference resets before the HPC
    skip, tandem_hit.c:42-46, so every N is visited individually — but since
    any N resets the k-mer, keeping one N per run is equivalent for seeds).
    """
    n = len(bseq)
    if n == 0:
        return bseq, np.zeros(0, dtype=np.int64)
    keep = np.empty(n, dtype=bool)
    keep[:-1] = bseq[:-1] != bseq[1:]
    keep[-1] = True
    idx = np.nonzero(keep)[0]
    return bseq[idx], idx


def direct_hash(
    bseq: np.ndarray, k: int, use_hpc: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """All k-mer seeds: returns (keys uint64, positions int64), in position
    order (reference direct_hash, src/tandem_hit.c:37-56)."""
    bseq = np.asarray(bseq, dtype=np.int64)
    if use_hpc:
        stream, positions = _hpc_compress(bseq)
    else:
        stream, positions = bseq, np.arange(len(bseq), dtype=np.int64)
    n = len(stream)
    if n < k:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64)
    # rolling key: key[i] = sum_{j<k} stream[i-j] << 2j, valid if no N in window
    mask = (np.uint64(1) << np.uint64(2 * k)) - np.uint64(1)
    key = np.zeros(n, dtype=np.uint64)
    base = np.where(stream >= 4, 0, stream).astype(np.uint64)
    for j in range(k):
        key[k - 1 :] |= base[j : n - k + 1 + j] << np.uint64(2 * (k - 1 - j))
    key &= mask
    # validity: window contains no N (key/l reset on N, tandem_hit.c:42-44)
    is_n = stream >= 4
    csum = np.concatenate(([0], np.cumsum(is_n)))
    valid = np.zeros(n, dtype=bool)
    valid[k - 1 :] = (csum[k:] - csum[: n - k + 1]) == 0
    idx = np.nonzero(valid)[0]
    return key[idx], positions[idx]


def minimizer_hash_vec(
    bseq: np.ndarray, k: int, w: int, use_hpc: bool = False
) -> tuple[np.ndarray, np.ndarray] | None:
    """Vectorized minimizer seeding for the common case; None = caller
    must use the general windowed path (minimizer_windowed).

    Reformulation (property-tested against the oracle,
    tests/test_seeding.py): on an N-free read the oracle's queue emits
    exactly the set {(key, pos): key equals the minimum of some window of
    w consecutive k-mers}, each at most once, plus — when fewer than w
    k-mers exist — the single last-position minimum of the partial
    buffer.  Position i is a window minimum iff
    sliding_max(sliding_min(keys, w), w)[i] == keys[i], two sliding
    extrema passes.  Order of emission is irrelevant downstream:
    collect_hits radix-sorts by (key, pos) first (tandem_hit.c:172).

    Falls back (returns None) for reads containing N — the reference's
    ring buffer deliberately keeps pre-N entries live across a reset, so
    minima can reach across N boundaries (tandem_hit.c:126-165); and for
    HPC k-mers spanning >= 255 bases (the span-drop rule,
    tandem_hit.c:120).  Both are rare and take the exact oracle.
    """
    bseq = np.asarray(bseq, dtype=np.int64)
    if len(bseq) and (bseq >= 4).any():
        return None
    keys, pos = direct_hash(bseq, k, use_hpc)
    n = len(keys)
    if n == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    if use_hpc:
        if n < k:
            # conservative cover for every seed's span when the k-apart
            # differences below don't exist: the last seed's end + 1
            # bounds all spans from the (notional) read start
            if pos[-1] + 1 >= 255:
                return None
        else:
            # first k seeds: pos[k-1]+1 >= span of every seed 0..k-1
            if pos[k - 1] + 1 >= 255:
                return None
            spans = pos[k:] - pos[:-k]
            if len(spans) and spans.max() >= 255:
                return None
    kk = keys.astype(np.uint64)
    if n < w:
        # partial buffer: the final flush emits the LAST position among
        # the minima (the oracle's `info[0] <= mn[0]` update rule)
        mn = kk.min()
        last = np.nonzero(kk == mn)[0][-1]
        return kk[last: last + 1], pos[last: last + 1]
    from numpy.lib.stride_tricks import sliding_window_view

    winmin = sliding_window_view(kk, w).min(axis=1)      # [n-w+1]
    # emitted(i) <=> exists window covering i with winmin == kk[i]
    # <=> max over covering windows of winmin == kk[i]
    cover = sliding_window_view(
        np.concatenate([
            np.zeros(w - 1, np.uint64), winmin, np.zeros(w - 1, np.uint64)
        ]), w
    ).max(axis=1)                                        # [n]
    emit = cover == kk
    return kk[emit], pos[emit]


def minimizer_windowed(
    bseq: np.ndarray, k: int, w: int, use_hpc: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """General minimizer seeding (handles N and HPC span drops), derived
    from the behavioral spec rather than the reference's queue.

    Spec (established against the sequential oracle by fuzz tests,
    tests/test_seeding.py::TestMinimizerWindowed): the seeder walks
    "steps" — one per base, except that with HPC a whole non-N
    homopolymer run is one step (Ns step individually) — and at each
    step t considers the window of the last w step infos, where
    info_t = (key_t, seqpos_t) if a k-mer is complete (>= k steps since
    the last N) and, under HPC, spans < 256 bases; else a +inf sentinel.
    Writing mn_t for the window minimum by key with the NEWEST step
    among equal keys (sentinels included, so mn_t is +inf iff the window
    holds no valid k-mer), the emitted stream is exactly:

      * window formation (t is the (w+k-1)-th step since the last N):
        every window entry STRICTLY OLDER than step t with
        key == mn_{t-1}.key except mn_{t-1} itself
      * a new minimum arrives (info_t <= mn_{t-1}, newest-tie) at
        >= w+k steps since the last N: mn_{t-1}
      * the minimum falls out of the window (mn_{t-1} entered at step
        t-w and info_t is not a new minimum), at >= w+k-1 steps: emit
        mn_{t-1}, then every window entry with key == mn_t.key except
        mn_t itself
      * end of read: mn_last

    (each emission only when the emitted info is not the sentinel).
    Downstream order is irrelevant: collect_hits sorts by (key, pos).
    This is the exact-semantics fallback for reads the fast two-pass
    path (minimizer_hash_vec) rejects; it re-derives the emission rules
    from the window-minimum invariant instead of porting the reference's
    ring-buffer/tie-loop structure (reference src/tandem_hit.c:97-157 is
    the behavior being specified, not the code followed)."""
    bseq = np.asarray(bseq, dtype=np.int64)
    n_raw = len(bseq)
    SENT = 1 << 62
    mask = (1 << (2 * k)) - 1
    key = 0
    l = 0
    spans: list[int] = []   # raw span per non-N step (HPC run lengths)
    i = 0
    # per step: (key-or-SENT, seq pos-or-SENT, steps since last N)
    infos: list[tuple[int, int, int]] = []
    while i < n_raw:
        c = int(bseq[i])
        if c < 4:
            run = 1
            if use_hpc:
                while i + run < n_raw and bseq[i + run] == c:
                    run += 1
            pos = i + run - 1
            i += run
            key = ((key << 2) | c) & mask
            l += 1
            if use_hpc:
                spans.append(run)
                span = sum(spans[-k:])
            else:
                span = min(l, k)
            if l >= k and span < 256:
                infos.append((key, pos, l))
            else:
                infos.append((SENT, SENT, l))
        else:
            l = 0
            key = 0
            spans.clear()
            infos.append((SENT, SENT, 0))
            i += 1

    T = len(infos)
    out_k: list[int] = []
    out_p: list[int] = []

    def wmin(t):
        """Window min at step t by key, newest-step tie; returns
        (key, pos, step)."""
        lo = max(0, t - w + 1)
        bk, bp, bt = SENT, SENT, lo
        for j in range(lo, t + 1):
            kj, pj, _ = infos[j]
            if kj <= bk:
                bk, bp, bt = kj, pj, j
        return bk, bp, bt

    mn = (SENT, SENT, 0)
    for t in range(T):
        kt, pt, lt = infos[t]
        # window formation: emit ties of the pre-step minimum (the entry
        # arriving this very step is excluded — only strictly older ones)
        if lt == w + k - 1 and mn[0] != SENT:
            for j in range(max(0, t - w + 1), t):
                kj, pj, _ = infos[j]
                if kj == mn[0] and pj != mn[1]:
                    out_k.append(kj)
                    out_p.append(pj)
        if kt <= mn[0]:
            # new (newest-tie) minimum arrives
            if lt >= w + k and mn[0] != SENT:
                out_k.append(mn[0])
                out_p.append(mn[1])
            mn = (kt, pt, t)
        elif mn[2] == t - w:
            # the tracked minimum fell out of the window
            if lt >= w + k - 1 and mn[0] != SENT:
                out_k.append(mn[0])
                out_p.append(mn[1])
            mn = wmin(t)
            if lt >= w + k - 1 and mn[0] != SENT:
                for j in range(max(0, t - w + 1), t + 1):
                    kj, pj, _ = infos[j]
                    if kj == mn[0] and pj != mn[1]:
                        out_k.append(kj)
                        out_p.append(pj)
    if mn[0] != SENT:
        out_k.append(mn[0])
        out_p.append(mn[1])
    return (
        np.asarray(out_k, dtype=np.uint64),
        np.asarray(out_p, dtype=np.int64),
    )


def build_kmer_seeds(
    bseq: np.ndarray, k: int, w: int, use_hpc: bool
) -> tuple[np.ndarray, np.ndarray]:
    """build_kmer_hash (src/tandem_hit.c:160-167)."""
    if w > 1:
        fast = minimizer_hash_vec(bseq, k, w, use_hpc)
        if fast is not None:
            return fast
        return minimizer_windowed(bseq, k, w, use_hpc)
    return direct_hash(bseq, k, use_hpc)


def collect_hits(
    keys: np.ndarray, positions: np.ndarray, min_p: int, max_p: int
) -> tuple[np.ndarray, np.ndarray]:
    """Self-hit generation (collect_hash_hit, src/tandem_hit.c:171-225).

    Returns (ends, periods) sorted by (end, period). Each seed occurrence
    contributes at most one hit: its nearest earlier same-key occurrence at
    distance >= min_p, kept iff distance <= max_p.
    """
    n = len(keys)
    if n == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    h = (keys.astype(np.uint64) << np.uint64(32)) | positions.astype(np.uint64)
    h = np.sort(h)
    key_s = (h >> np.uint64(32)).astype(np.int64)
    pos_s = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)
    # group starts per element
    new_group = np.empty(n, dtype=bool)
    new_group[0] = True
    new_group[1:] = key_s[1:] != key_s[:-1]
    group_start = np.maximum.accumulate(np.where(new_group, np.arange(n), 0))
    # nearest earlier occurrence at distance >= min_p:
    # largest index idx with (key, pos) <= (key_j, pos_j - min_p)
    tgt_pos = pos_s - min_p
    search = (key_s.astype(np.uint64) << np.uint64(32)) | np.maximum(
        tgt_pos, 0
    ).astype(np.uint64)
    idx = np.searchsorted(h, search, side="right") - 1
    ok = (tgt_pos >= 0) & (idx >= group_start)
    idx_c = np.clip(idx, 0, n - 1)
    period = pos_s - pos_s[idx_c]
    ok &= period <= max_p
    ends = pos_s[ok]
    periods = period[ok]
    order = np.lexsort((periods, ends))
    return ends[order], periods[order]


def collect_tandem_repeat_hits(
    bseq: np.ndarray, k: int, w: int, use_hpc: bool, min_p: int, max_p: int
) -> tuple[np.ndarray, np.ndarray]:
    """collect_tandem_repeat_hit (src/tandem_hit.c:227-237)."""
    keys, positions = build_kmer_seeds(bseq, k, w, use_hpc)
    if len(keys) == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    return collect_hits(keys, positions, min_p, max_p)
