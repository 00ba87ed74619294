"""Seeding oracle vs a literal per-position port of the reference seeder."""

import numpy as np
import pytest

from tidehunter_tpu.ops.seeding import collect_hits, direct_hash, minimizer_hash


def c_direct_hash(bseq, k, use_hpc):
    out, key, l = [], 0, 0
    mask = (1 << (2 * k)) - 1
    pos, n = 0, len(bseq)
    while pos < n:
        c = int(bseq[pos])
        if c >= 4:
            key, l = 0, 0
            pos += 1
            continue
        if use_hpc:
            while pos + 1 < n and bseq[pos + 1] == c:
                pos += 1
        key = (key << 2) | c
        l += 1
        if l >= k:
            out.append((key & mask, pos))
        pos += 1
    return out


def c_collect(h, min_p, max_p):
    h = sorted(h)
    n = len(h)
    hits = []
    i = 0
    while i < n:
        j = i
        while j < n and h[j][0] == h[i][0]:
            j += 1
        grp = h[i:j]
        for a in range(1, len(grp)):
            p = None
            for b in range(a - 1, -1, -1):
                p = grp[a][1] - grp[b][1]
                if p >= min_p:
                    break
            if p is not None and min_p <= p <= max_p:
                hits.append((grp[a][1], p))
        i = j
    hits.sort()
    return hits


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("hpc", [False, True])
def test_direct_hash_and_hits(seed, hpc):
    rng = np.random.default_rng(seed)
    for _ in range(30):
        unit = rng.integers(0, 5, int(rng.integers(3, 30)))
        reps = int(rng.integers(1, 6))
        bseq = np.concatenate(
            [unit] * reps + [rng.integers(0, 5, int(rng.integers(0, 50)))]
        ).astype(np.uint8)
        for k in (3, 8):
            keys, pos = direct_hash(bseq, k, hpc)
            want = c_direct_hash(bseq, k, hpc)
            assert list(zip(keys.astype(int).tolist(), pos.tolist())) == want
            for min_p, max_p in ((2, 100), (5, 20)):
                e, p = collect_hits(keys, pos, min_p, max_p)
                assert list(zip(e.tolist(), p.tolist())) == c_collect(
                    want, min_p, max_p
                )


def test_minimizer_basic():
    bseq = np.array([0, 1, 2, 3] * 30, dtype=np.uint8)
    keys, pos = minimizer_hash(bseq, 5, 4)
    assert len(keys) > 0
    assert (pos >= 4).all()
    # minimizers are a subset of all k-mers
    all_keys, all_pos = direct_hash(bseq, 5, False)
    allset = set(zip(all_keys.tolist(), all_pos.tolist()))
    assert set(zip(keys.tolist(), pos.tolist())) <= allset
