"""ksw2 oracle vs brute-force affine DP (scores, cigars, extension maxima)."""

import numpy as np
import pytest

from tidehunter_tpu.ops import ksw2

NEG = -(10**9)


def brute_affine_H(q, t):
    m, n = len(q), len(t)
    H = np.full((m + 1, n + 1), NEG, dtype=np.int64)
    E = np.full((m + 1, n + 1), NEG, np.int64)
    F = np.full((m + 1, n + 1), NEG, np.int64)
    H[0, 0] = 0
    for i in range(m + 1):
        for j in range(n + 1):
            if i > 0:
                E[i, j] = max(H[i - 1, j] - 3, E[i - 1, j] - 1)
                H[i, j] = max(H[i, j], E[i, j])
            if j > 0:
                F[i, j] = max(H[i, j - 1] - 3, F[i, j - 1] - 1)
                H[i, j] = max(H[i, j], F[i, j])
            if i > 0 and j > 0:
                s = -1 if (q[i - 1] == 4 or t[j - 1] == 4) else (
                    1 if q[i - 1] == t[j - 1] else -2
                )
                H[i, j] = max(H[i, j], H[i - 1, j - 1] + s)
    return H


@pytest.mark.parametrize("seed", range(5))
def test_global_score_and_cigar(seed):
    rng = np.random.default_rng(seed)
    for _ in range(40):
        m, n = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        q = rng.integers(0, 5, m).astype(np.uint8)
        t = rng.integers(0, 5, n).astype(np.uint8)
        r = ksw2.extz(q, t)
        assert r.score == brute_affine_H(q, t)[m, n]
        qc = sum(l for l, op in r.cigar if op in (0, 1))
        tc = sum(l for l, op in r.cigar if op in (0, 2))
        assert qc == m and tc == n
        # cigar must reproduce the optimal score
        sc, qi, ti = 0, 0, 0
        for l, op in r.cigar:
            if op == 0:
                for _k in range(l):
                    sc += -1 if (q[qi] == 4 or t[ti] == 4) else (
                        1 if q[qi] == t[ti] else -2
                    )
                    qi += 1
                    ti += 1
            else:
                sc -= 2 + l
                if op == 1:
                    qi += l
                else:
                    ti += l
        assert sc == r.score


@pytest.mark.parametrize("seed", range(3))
def test_extension_max(seed):
    rng = np.random.default_rng(100 + seed)
    for _ in range(40):
        m, n = int(rng.integers(1, 30)), int(rng.integers(1, 30))
        q = rng.integers(0, 5, m).astype(np.uint8)
        t = rng.integers(0, 5, n).astype(np.uint8)
        r = ksw2.extz(q, t, score_only=True)
        H = brute_affine_H(q, t)
        if r.max_q >= 0:
            assert H[r.max_q + 1, r.max_t + 1] == r.max
            assert r.max == H[1:, 1:].max() and r.max > 0
        else:
            assert H[1:, 1:].max() <= 0


def test_left_aligned_gaps():
    # AAA vs AAAA: single deletion must be leftmost (flag=0 semantics)
    q = np.array([0, 0, 0], dtype=np.uint8)
    t = np.array([0, 0, 0, 0], dtype=np.uint8)
    r = ksw2.extz(q, t)
    assert r.cigar[0][1] == ksw2.CDEL, r.cigar


def test_backtrack_left_end():
    cigar = [(10, 0), (2, 1), (5, 0)]  # 10M2I5M
    assert ksw2.backtrack_left_end(cigar, 3) == 3
    assert ksw2.backtrack_left_end(cigar, 5) == 5
    assert ksw2.backtrack_left_end(cigar, 6) == 5
    assert ksw2.backtrack_left_end(cigar, 8) == 6
    cigar = [(4, 0), (3, 2), (4, 0)]  # 4M3D4M
    assert ksw2.backtrack_left_end(cigar, 5) == 8


def test_identity_count():
    q = np.array([0, 1, 2, 3], dtype=np.uint8)
    t = np.array([0, 1, 2, 3], dtype=np.uint8)
    assert ksw2.global_identity(q, t) == 4
    t2 = np.array([0, 1, 0, 3], dtype=np.uint8)
    assert ksw2.global_identity(q, t2) == 3
