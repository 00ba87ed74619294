"""Parity: native alignx.c vs the ops/ksw2 NumPy oracle.

The native kernel resolves the partition walk's small 'global' requests
host-side (engine.BatchAligner.run_global); its (iden_n, t_left_ext)
contract must be bit-exact with the oracle resolution (and with the
device wavefront kernel, which is itself oracle-pinned)."""

import numpy as np
import pytest

from tidehunter_tpu.ops import ksw2
from tidehunter_tpu.ops.ksw2_native import (
    available,
    global_tleft_batch,
)

pytestmark = pytest.mark.skipif(
    not available(), reason="native library unavailable"
)


def _oracle(q, t, qle):
    iden, cig = ksw2.global_with_cigar(q, t)
    if qle > len(q):
        return iden, len(t)
    return iden, ksw2.backtrack_left_end(cig, qle)


def test_fuzz_vs_oracle():
    rng = np.random.default_rng(7)
    reqs = []
    for _ in range(300):
        ql = int(rng.integers(1, 160))
        tl = int(rng.integers(1, 160))
        q = rng.integers(0, 4, ql).astype(np.uint8)
        t = rng.integers(0, 4, tl).astype(np.uint8)
        # bias towards related sequences (the real workload): mutate q->t
        if rng.random() < 0.7:
            tl = min(tl, ql)
            t = q[:tl].copy()
            nmut = int(rng.integers(0, max(1, tl // 4)))
            for _ in range(nmut):
                t[rng.integers(0, tl)] = rng.integers(0, 4)
        qle = int(rng.integers(0, ql + 1))
        reqs.append((q, t, qle))
    got = global_tleft_batch(reqs)
    for (q, t, qle), g in zip(reqs, got):
        assert g == _oracle(q, t, qle), (len(q), len(t), qle)


def test_n_bases_and_qle_edges():
    rng = np.random.default_rng(11)
    reqs = []
    for _ in range(60):
        ql = int(rng.integers(1, 80))
        tl = int(rng.integers(1, 80))
        q = rng.integers(0, 5, ql).astype(np.uint8)   # incl. N (=4)
        t = rng.integers(0, 5, tl).astype(np.uint8)
        for qle in (0, 1, ql, ql + 3):                # incl. qle > qlen
            reqs.append((q, t, qle))
    got = global_tleft_batch(reqs)
    for (q, t, qle), g in zip(reqs, got):
        assert g == _oracle(q, t, qle), (len(q), len(t), qle)


def test_degenerate_lengths():
    q = np.array([0, 1, 2], np.uint8)
    t = np.array([0, 1, 2], np.uint8)
    one = np.array([3], np.uint8)
    got = global_tleft_batch([(q, t, 2), (one, one, 0), (one, t, 1)])
    exp = [_oracle(q, t, 2), _oracle(one, one, 0), _oracle(one, t, 1)]
    assert got == exp
