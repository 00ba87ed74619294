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


def minimizer_hash(
    bseq: np.ndarray, k: int, w: int, use_hpc: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """Minimizer seeding with tie emission (reference minimizer_hash,
    src/tandem_hit.c:97-157). Faithful port of the queue algorithm; w is the
    window size in k-mer positions. HPC spans >= 256 bases drop the k-mer
    (tandem_hit.c:120)."""
    bseq = np.asarray(bseq, dtype=np.int64)
    seq_len = len(bseq)
    UINT32_MAX = 0xFFFFFFFF
    mask = (1 << (2 * k)) - 1
    out_keys: list[int] = []
    out_pos: list[int] = []

    buf = [(UINT32_MAX, UINT32_MAX)] * w
    mn = (UINT32_MAX, UINT32_MAX)
    min_pos = 0
    buf_pos = 0
    l = 0
    key = 0
    kmer_span = 0
    tq: list[int] = []  # HPC span queue
    i = 0
    while i < seq_len:
        c = int(bseq[i])
        info = (UINT32_MAX, UINT32_MAX)
        if c < 4:
            if use_hpc:
                skip_len = 1
                if i + 1 < seq_len and bseq[i + 1] == c:
                    skip_len = 2
                    while i + skip_len < seq_len and bseq[i + skip_len] == c:
                        skip_len += 1
                    i += skip_len - 1
                tq.append(skip_len)
                kmer_span += skip_len
                if len(tq) > k:
                    kmer_span -= tq.pop(0)
            else:
                kmer_span = l + 1 if l + 1 < k else k
            key = ((key << 2) | c) & mask
            l += 1
            if l >= k and kmer_span < 256:
                info = (key, i)
        else:
            l = 0
            tq.clear()
            kmer_span = 0
            key = 0
        buf[buf_pos] = info

        if l == w + k - 1 and mn[0] != UINT32_MAX:
            for j in range(buf_pos + 1, w):
                if mn[0] == buf[j][0] and buf[j][1] != mn[1]:
                    out_keys.append(buf[j][0])
                    out_pos.append(buf[j][1])
            for j in range(buf_pos):
                if mn[0] == buf[j][0] and buf[j][1] != mn[1]:
                    out_keys.append(buf[j][0])
                    out_pos.append(buf[j][1])

        if info[0] <= mn[0]:
            if l >= w + k and mn[0] != UINT32_MAX:
                out_keys.append(mn[0])
                out_pos.append(mn[1])
            mn = info
            min_pos = buf_pos
        elif buf_pos == min_pos:
            if l >= w + k - 1 and mn[0] != UINT32_MAX:
                out_keys.append(mn[0])
                out_pos.append(mn[1])
            mn = (UINT32_MAX, UINT32_MAX)
            for j in range(buf_pos + 1, w):
                if mn[0] >= buf[j][0]:
                    mn = buf[j]
                    min_pos = j
            for j in range(buf_pos + 1):
                if mn[0] >= buf[j][0]:
                    mn = buf[j]
                    min_pos = j
            if l >= w + k - 1 and mn[0] != UINT32_MAX:
                for j in range(buf_pos + 1, w):
                    if mn[0] == buf[j][0] and mn[1] != buf[j][1]:
                        out_keys.append(buf[j][0])
                        out_pos.append(buf[j][1])
                for j in range(buf_pos + 1):
                    if mn[0] == buf[j][0] and mn[1] != buf[j][1]:
                        out_keys.append(buf[j][0])
                        out_pos.append(buf[j][1])
        buf_pos += 1
        if buf_pos == w:
            buf_pos = 0
        i += 1
    if mn[0] != UINT32_MAX:
        out_keys.append(mn[0])
        out_pos.append(mn[1])
    return (
        np.asarray(out_keys, dtype=np.uint64),
        np.asarray(out_pos, dtype=np.int64),
    )


def minimizer_hash_vec(
    bseq: np.ndarray, k: int, w: int, use_hpc: bool = False
) -> tuple[np.ndarray, np.ndarray] | None:
    """Vectorized minimizer seeding for the common case; None = caller
    must use the sequential oracle (minimizer_hash).

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
    if use_hpc and n >= k:
        # first k-mer spans from the read start (pos[-1] == -1 notionally)
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


def build_kmer_seeds(
    bseq: np.ndarray, k: int, w: int, use_hpc: bool
) -> tuple[np.ndarray, np.ndarray]:
    """build_kmer_hash (src/tandem_hit.c:160-167)."""
    if w > 1:
        fast = minimizer_hash_vec(bseq, k, w, use_hpc)
        if fast is not None:
            return fast
        return minimizer_hash(bseq, k, w, use_hpc)
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
