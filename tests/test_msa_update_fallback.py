"""update_step relayout branch agreement: the shift-accumulate loop
(kmax <= 64) and the take_along_axis gather fallback must be
bit-identical on the same inputs.  The production workloads never cross
the kmax threshold (insertions per round are ~err/3 * qlen), so without
this test the lax.cond's gather branch would be dead in CI.  Semantics
under test: ops_c is right-anchored compacted ops (msa_device.py
_make_bt_kernel contract), forward step p at lane p + NP - nst."""

import numpy as np
import pytest

from tidehunter_tpu.ops.msa_device import (
    OP_D, OP_I, OP_M, _build_jits)


def _mk_inputs(rng, B, T, NP, n_ins):
    """Random profile + a step sequence with n_ins leading inserts (an
    I-heavy alignment drives kmax = n_ins past any threshold)."""
    counts = rng.integers(0, 80, (B, T, 5)).astype(np.int16)
    n_placed = np.full(B, 3, np.int32)
    lo, hi = T // 4, T - n_ins - 4
    assert lo < hi, "test shape too small for n_ins"
    ncol = rng.integers(lo, hi, B).astype(np.int32)
    overflow = np.zeros(B, bool)
    unit = rng.integers(0, 4, (B, T)).astype(np.int32)
    qlen = rng.integers(T // 2, T - 4, B).astype(np.int32)
    active = np.ones(B, bool)
    ops = np.full((B, NP), 3, np.uint8)  # OP_PAD
    nst = np.zeros((B, 1), np.int32)
    for b in range(B):
        # path: n_ins inserts, then alternate M/D over the old columns
        path = [OP_I] * n_ins
        c = q = n_ins and 0
        q = n_ins  # inserts consumed q
        while c < ncol[b] and len(path) < T - 2:
            if q < qlen[b] and (len(path) % 3 != 2):
                path.append(OP_M)
                q += 1
            else:
                path.append(OP_D)
            c += 1
        nst[b, 0] = len(path)
        # right-anchored: forward step p lands at lane p + NP - nst
        ops[b, NP - len(path):] = path
    return (counts, n_placed, ncol, overflow, unit, qlen, active,
            ops, nst)


@pytest.mark.parametrize("n_ins", [2, 70])
def test_shift_and_gather_branches_agree(monkeypatch, n_ins):
    rng = np.random.default_rng(5 + n_ins)
    B, T, NP = 8, 256, 512
    args = _mk_inputs(rng, B, T, NP, n_ins)

    monkeypatch.delenv("TH_MSA_SHIFT", raising=False)
    up_shift = _build_jits(2, 4, 4, 2, 24, 1)[2]
    a = [np.asarray(x) for x in up_shift(*args)]

    monkeypatch.setenv("TH_MSA_SHIFT", "0")
    up_gather = _build_jits(2, 4, 4, 2, 24, 1)[2]
    b = [np.asarray(x) for x in up_gather(*args)]

    for got, want in zip(a, b):
        np.testing.assert_array_equal(got, want)
    # at n_ins=70 the cond takes the gather branch inside up_shift too;
    # the agreement then proves the threshold is seamless
