"""Seeding oracle vs a literal per-position port of the reference seeder."""

import numpy as np
import pytest

from tidehunter_tpu.ops.seeding import collect_hits, direct_hash
from oracle_minimizer import minimizer_hash


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


class TestMinimizerVectorized:
    """minimizer_hash_vec multiset-equals the sequential oracle on N-free
    reads (order is irrelevant: collect_hits sorts by (key, pos) first,
    tandem_hit.c:172), and build_kmer_seeds falls back to the oracle for
    N-bearing reads and HPC span overflows."""

    @pytest.mark.parametrize("k,w,hpc", [
        (5, 2, False), (5, 4, False), (8, 3, False), (8, 16, False),
        (13, 5, False), (3, 7, False),
        (5, 4, True), (8, 3, True),
    ])
    def test_multiset_parity(self, k, w, hpc):
        from tidehunter_tpu.ops.seeding import minimizer_hash_vec

        rng = np.random.default_rng(k * 100 + w)
        lengths = [0, 1, k - 1, k, k + w - 2, k + w - 1, k + w,
                   50, 173, 400]
        for L in lengths:
            seq = rng.integers(0, 4, L).astype(np.uint8)
            # occasionally tandem so keys repeat heavily
            if L >= 60:
                p = L // 4
                seq = np.tile(seq[:p], 5)[:L].astype(np.uint8)
            got = minimizer_hash_vec(seq, k, w, hpc)
            assert got is not None
            wk, wp = minimizer_hash(seq, k, w, hpc)
            import collections
            a = collections.Counter(zip(got[0].tolist(), got[1].tolist()))
            b = collections.Counter(zip(wk.tolist(), wp.tolist()))
            assert a == b, (L, a, b)

    def test_n_reads_fall_back_to_oracle(self):
        from tidehunter_tpu.ops.seeding import (
            build_kmer_seeds,
            minimizer_hash_vec,
        )

        rng = np.random.default_rng(5)
        seq = rng.integers(0, 4, 150).astype(np.uint8)
        seq[40] = 4
        seq[90] = 4
        assert minimizer_hash_vec(seq, 5, 4) is None
        gk, gp = build_kmer_seeds(seq, 5, 4, False)
        wk, wp = minimizer_hash(seq, 5, 4)
        assert sorted(zip(gk.tolist(), gp.tolist())) == \
            sorted(zip(wk.tolist(), wp.tolist()))

    def test_hpc_span_overflow_falls_back(self):
        from tidehunter_tpu.ops.seeding import (
            build_kmer_seeds,
            minimizer_hash_vec,
        )

        # a 300-base homopolymer makes one HPC k-mer span >= 255
        seq = np.concatenate([
            np.random.default_rng(1).integers(0, 4, 50),
            np.full(300, 2),
            np.random.default_rng(2).integers(0, 4, 50),
        ]).astype(np.uint8)
        assert minimizer_hash_vec(seq, 5, 4, use_hpc=True) is None
        gk, gp = build_kmer_seeds(seq, 5, 4, True)
        wk, wp = minimizer_hash(seq, 5, 4, True)
        assert sorted(zip(gk.tolist(), gp.tolist())) == \
            sorted(zip(wk.tolist(), wp.tolist()))

    def test_speedup(self):
        import time

        from tidehunter_tpu.ops.seeding import minimizer_hash_vec

        rng = np.random.default_rng(0)
        seq = rng.integers(0, 4, 20000).astype(np.uint8)
        minimizer_hash_vec(seq, 8, 5)  # warm numpy internals
        t0 = time.perf_counter()
        minimizer_hash_vec(seq, 8, 5)
        fast = time.perf_counter() - t0
        t0 = time.perf_counter()
        minimizer_hash(seq, 8, 5)
        slow = time.perf_counter() - t0
        assert fast * 3 < slow, (fast, slow)


class TestMinimizerWindowed:
    """The clean-room windowed implementation (production fallback for
    N-bearing reads and HPC span overflows) equals the transliterated
    queue oracle as a multiset on adversarial inputs."""

    def test_fuzz_vs_oracle(self):
        from tidehunter_tpu.ops.seeding import minimizer_windowed

        rng = np.random.default_rng(0)
        for trial in range(400):
            L = int(rng.integers(0, 200))
            b = rng.integers(0, 4, L)
            nmask = rng.random(L) < rng.choice([0.0, 0.02, 0.15])
            b = np.where(nmask, 4, b)
            if rng.random() < 0.4 and L > 10:
                at = int(rng.integers(0, L - 5))
                ln = int(rng.integers(3, min(300, L - at)))
                b[at:at + ln] = b[at]
            k = int(rng.integers(2, 9))
            w = int(rng.integers(2, 9))
            hpc = bool(rng.integers(0, 2))
            b = b.astype(np.uint8)
            ok, op = minimizer_hash(b, k, w, hpc)
            nk, npos = minimizer_windowed(b, k, w, hpc)
            assert sorted(zip(ok.tolist(), op.tolist())) == \
                sorted(zip(nk.tolist(), npos.tolist())), (trial, L, k, w, hpc)
