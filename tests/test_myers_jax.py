"""Device Myers HW kernel (ops/myers_jax.py) vs the host oracle
(ops/myers.align_hw) — bit-identical (ed, start, end) incl. the
leftmost-end / leftmost-start edlib tie rules, multi-word queries
(>32 bp, >64 bp), k caps, and host fallbacks."""

import numpy as np
import pytest

from tidehunter_tpu.ops.myers import align_hw
from tidehunter_tpu.ops.myers_jax import hw_batch

BASES = "ACGT"


def _rand_seq(rng, n):
    return "".join(BASES[c] for c in rng.integers(0, 4, n))


def _mutseq(rng, s, rate):
    out = []
    for c in s:
        r = rng.random()
        if r < rate / 3:
            continue
        elif r < 2 * rate / 3:
            out.append(BASES[rng.integers(0, 4)])
            out.append(c)
        elif r < rate:
            out.append(BASES[rng.integers(0, 4)])
        else:
            out.append(c)
    return "".join(out)


@pytest.mark.parametrize("qlen", [5, 25, 31, 32, 33, 63, 64, 65, 84, 128])
def test_device_matches_oracle(qlen):
    rng = np.random.default_rng(qlen)
    queries, targets, ks = [], [], []
    for t in range(12):
        q = _rand_seq(rng, qlen)
        tlen = int(rng.integers(qlen, 400))
        tgt = _rand_seq(rng, tlen)
        if t % 3 == 0:
            # plant a noisy copy so a real infix hit exists
            at = int(rng.integers(0, max(1, tlen - qlen)))
            tgt = tgt[:at] + _mutseq(rng, q, 0.1) + tgt[at:]
        queries.append(q)
        targets.append(tgt)
        ks.append([-1, qlen // 2, 2][t % 3])
    got = hw_batch(queries, targets, ks)
    for (q, t, k, g) in zip(queries, targets, ks, got):
        assert g == align_hw(q, t, k), (len(q), len(t), k)


def test_adapter_shapes_from_reference():
    """The reference's shipped adapters (84 bp and 25 bp) against
    realistic doubled-consensus targets."""
    five = ("AATGATACGGCGACCACCGAGATCTACACTCGACTAGTCGTCGGCAGCGTCAGAT"
            "GTGTATAAGAGACAGTGAATTCTGGTGGG")
    three = "AAGCAGTGGTATCAACGCAGAGTAC"
    rng = np.random.default_rng(0)
    cons = _rand_seq(rng, 300)
    t = cons[50:] + five + cons + three + cons[:50]
    tt = t + t
    for q in (five, three):
        for k in (-1, int(len(q) * 0.2)):
            assert hw_batch([q], [tt], [k])[0] == align_hw(q, tt, k)


def test_fallbacks():
    # lowercase ok, ambiguity codes fall back to host, empty handled
    got = hw_batch(
        ["acgT", "ACRT", ""],
        ["ggACGTgg", "AACRTA", "ACGT"],
        [-1, -1, -1],
    )
    assert got[0] == align_hw("acgT", "ggACGTgg", -1)
    assert got[1] == align_hw("ACRT", "AACRTA", -1)
    assert got[2] == align_hw("", "ACGT", -1)


def test_case_insensitive():
    assert hw_batch(["AcGt"], ["ttACGTtt"], [-1])[0] == \
        align_hw("AcGt", "ttACGTtt", -1)
