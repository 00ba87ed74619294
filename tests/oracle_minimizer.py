"""Transliterated reference minimizer queue — TESTS-ONLY oracle.

This is a statement-for-statement port of the reference's minimizer ring
buffer (reference src/tandem_hit.c:97-157) kept ONLY as the ground truth
for the production implementations' fuzz tests.  No production code path
imports this module: the engine uses ops/seeding.minimizer_hash_vec (the
vectorized two-pass reformulation) with ops/seeding.minimizer_windowed
(re-derived from the behavioral spec) as the general fallback.
"""

from __future__ import annotations

import numpy as np


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
