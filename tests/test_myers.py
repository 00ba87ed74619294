"""Myers bit-parallel HW/NW vs brute-force DP, including edlib's
leftmost-end / leftmost-start tie-breaks."""

import random

import numpy as np
import pytest

from tidehunter_tpu.ops.myers import align_hw, edit_distance_nw


def brute_hw(q, t, k=-1):
    q, t = q.upper(), t.upper()
    m, n = len(q), len(t)
    D = np.zeros((m + 1, n + 1), dtype=int)
    D[:, 0] = np.arange(m + 1)
    D[0, :] = 0
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            D[i, j] = min(
                D[i - 1, j - 1] + (q[i - 1] != t[j - 1]),
                D[i - 1, j] + 1,
                D[i, j - 1] + 1,
            )
    row = D[m, 1:]
    best = int(row.min())
    if k >= 0 and best > k:
        return (-1, None, None)
    end = int(np.argmin(row))
    for s in range(end + 1):
        sub = t[s : end + 1]
        mm, nn = m, len(sub)
        E = np.zeros((mm + 1, nn + 1), dtype=int)
        E[:, 0] = np.arange(mm + 1)
        E[0, :] = np.arange(nn + 1)
        for i in range(1, mm + 1):
            for j in range(1, nn + 1):
                E[i, j] = min(
                    E[i - 1, j - 1] + (q[i - 1] != sub[j - 1]),
                    E[i - 1, j] + 1,
                    E[i, j - 1] + 1,
                )
        if E[mm, nn] == best:
            return (best, s, end)
    raise AssertionError


@pytest.mark.parametrize("seed", range(3))
def test_hw_vs_brute(seed):
    random.seed(seed)
    for _ in range(60):
        m = random.randint(1, 12)
        n = random.randint(1, 40)
        q = "".join(random.choice("ACGT") for _ in range(m))
        t = "".join(random.choice("ACGT") for _ in range(n))
        k = random.choice([-1, 0, 1, 2, 5])
        assert align_hw(q, t, k) == brute_hw(q, t, k)


def test_case_insensitive():
    assert align_hw("acgt", "AAACGTAA") == (0, 2, 5)
    assert align_hw("ACGT", "aaacgtaa") == (0, 2, 5)


def test_nw():
    assert edit_distance_nw("ACGT", "ACGT") == 0
    assert edit_distance_nw("ACGT", "AGT") == 1
    assert edit_distance_nw("ACGT", "AGT", k=0) == -1
    assert edit_distance_nw("", "AAA") == 3
