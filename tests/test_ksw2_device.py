"""Batched device kernels (JAX scan + Pallas) vs the NumPy oracle.

Runs on the CPU backend in tests (conftest forces JAX_PLATFORMS=cpu with an
8-device mesh); the Pallas kernel runs in interpret-equivalent CPU lowering.
"""

import numpy as np
import pytest

from tidehunter_tpu.ops import ksw2
from tidehunter_tpu.ops import ksw2_jax


def _make_batch(rng, B, LQ, LT):
    q = np.full((B, LQ), 4, np.uint8)
    t = np.full((B, LT), 4, np.uint8)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    qle = np.zeros(B, np.int32)
    oracle = []
    for b in range(B):
        m = int(rng.integers(1, LQ + 1))
        n = int(rng.integers(1, LT + 1))
        qs = rng.integers(0, 5, m).astype(np.uint8)
        ts = rng.integers(0, 5, n).astype(np.uint8)
        q[b, :m] = qs
        t[b, :n] = ts
        qlen[b], tlen[b] = m, n
        qle[b] = int(rng.integers(1, m + 1))
        r = ksw2.extz(qs, ts)
        iden, cig = ksw2.global_with_cigar(qs, ts)
        tle = ksw2.backtrack_left_end(cig, int(qle[b]))
        rs = ksw2.extz(qs, ts, score_only=True)
        oracle.append((r.score, iden, tle, rs.max, rs.max_t, rs.max_q))
    return q, qlen, t, tlen, qle, oracle


@pytest.mark.parametrize("seed", range(2))
def test_jax_batch_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    q, qlen, t, tlen, qle, oracle = _make_batch(rng, 12, 40, 48)
    mx, mt, mq, sc = ksw2_jax.extz_score_batch(q, qlen, t, tlen)
    gsc, giden, gtle = ksw2_jax.extz_global_batch(q, qlen, t, tlen, qle)
    for b, o in enumerate(oracle):
        assert sc[b] == o[0] == gsc[b]
        assert giden[b] == o[1]
        assert gtle[b] == o[2]
        assert (mx[b], mt[b], mq[b]) == (o[3], o[4], o[5])

