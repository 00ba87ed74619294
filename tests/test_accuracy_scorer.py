"""Cross-check of the accuracy-eval scorer (evals/accuracy.py).

The eval scores each called consensus against the true unit the way the
reference paper does (reference simulation/README.md:43-46: accuracy vs a
two-copy concatemer `sim.fa.tr`): infix (HW) alignment of the consensus
against unit+unit, rotation-invariant because any rotation of the unit is
an infix of the doubled unit.

The eval otherwise self-scores with the repo's own machinery (VERDICT r2
weak #8), so this test pins the scorer against an INDEPENDENT textbook
Levenshtein infix DP written here from scratch, plus the rotation
invariants the protocol relies on.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from evals.accuracy import consensus_identity, make_read, mutate  # noqa: E402
from tidehunter_tpu.io.codec import decode  # noqa: E402
from tidehunter_tpu.ops.myers import align_hw  # noqa: E402


def _infix_edit_distance(q: str, t: str) -> int:
    """Plain O(nm) infix (semi-global) edit distance: q aligned whole,
    free start/end in t. Independent of the production Myers kernel."""
    n, m = len(q), len(t)
    prev = [0] * (m + 1)            # row 0: free start in t
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cost = 0 if q[i - 1] == t[j - 1] else 1
            cur[j] = min(prev[j - 1] + cost, prev[j] + 1, cur[j - 1] + 1)
        prev = cur
    return min(prev)                # free end in t


def test_scorer_vs_independent_infix_dp():
    """The production HW aligner the eval scores with must equal the
    textbook infix DP on consensus-vs-doubled-unit instances."""
    rng = np.random.default_rng(5)
    for _ in range(40):
        ul = int(rng.integers(20, 90))
        unit = rng.integers(0, 4, ul).astype(np.uint8)
        rot = int(rng.integers(0, ul))
        cons = np.roll(unit, rot)
        cons = mutate(rng, cons, float(rng.uniform(0, 0.25)))
        if len(cons) == 0:
            continue
        unit2 = decode(np.concatenate([unit, unit]))
        cs = decode(cons)
        ed, _, _ = align_hw(cs, unit2, -1)
        exp = _infix_edit_distance(cs, unit2)
        assert ed == exp, (ul, rot)
        # and the eval's identity formula is exactly 1 - ed/len(cons)
        got = consensus_identity(cs, decode(unit))
        assert got == pytest.approx(1.0 - ed / len(cs))


def test_rotation_invariance():
    """Any exact rotation of the unit scores identity 1.0 — the property
    the doubled-unit trick (== the reference's sim.fa.tr two-copy
    concatemer) exists to provide."""
    rng = np.random.default_rng(9)
    for ul in (30, 57, 200):
        unit = decode(rng.integers(0, 4, ul).astype(np.uint8))
        for rot in (0, 1, ul // 3, ul - 1):
            cons = unit[rot:] + unit[:rot]
            assert consensus_identity(cons, unit) == pytest.approx(1.0)


def test_planted_errors_bound():
    """k planted substitutions lower identity by at most k/len."""
    rng = np.random.default_rng(13)
    unit = decode(rng.integers(0, 4, 120).astype(np.uint8))
    cons = list(unit[40:] + unit[:40])
    planted = 0
    for pos in (5, 33, 61, 99):
        old = cons[pos]
        new = "ACGT"[(("ACGT".index(old)) + 1) % 4]
        cons[pos] = new
        planted += 1
    got = consensus_identity("".join(cons), unit)
    assert got >= 1.0 - planted / 120 - 1e-9
    assert got < 1.0


def test_simulator_read_structure():
    """make_read's ground truth is self-consistent: the read embeds
    `copies` mutated copies of the returned unit between flanks, and the
    per-copy mutation rate matches the requested error rate to within
    sampling noise (the reference simulator's uniform sub/ins/del split,
    simulation/README.md:17-20)."""
    rng = np.random.default_rng(21)
    seq, unit = make_read(rng, err=0.15, unit_len=500, copies=10)
    # detectable: read length ~ flanks + copies * unit * (1 +- small)
    assert abs(len(seq) - (200 + 10 * 500)) < 10 * 500 * 0.1
    assert consensus_identity(unit, unit) == pytest.approx(1.0)
    # a noisy copy-sized window scores ~1-err vs the unit
    window = seq[100 + 500 : 100 + 2 * 500]
    got = consensus_identity(window, unit)
    assert 0.70 < got < 0.95
