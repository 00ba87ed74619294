"""Parity: native graph-POA (native/poax.c) vs the NumPy oracle.

The C walk is a re-expression of ops/poa.py's PoaGraph with every
tie-breaking rule preserved (predecessor-order strict-> updates, >=
insertion-opener scan, end-node (H, -rank) choice, smaller-base argmax).
This fuzz suite pins bit-identical consensus + coverage across unit-count,
length, error-rate, and N-base regimes.
"""

import numpy as np
import pytest

from tidehunter_tpu import native
from tidehunter_tpu.ops.poa import msa_consensus_py, _msa_consensus_native

SCORES = dict(match=2, mismatch=4, gap_open1=4, gap_ext1=2,
              gap_open2=24, gap_ext2=1)

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native library unavailable")


def _assert_parity(units):
    nat = _msa_consensus_native(units, *SCORES.values())
    assert nat is not None
    ref_cons, ref_cov = msa_consensus_py(units, **SCORES)
    np.testing.assert_array_equal(nat[0], ref_cons)
    np.testing.assert_array_equal(nat[1], ref_cov)


def _mutate(u, err, rng):
    out = []
    for c in u:
        r = rng.random()
        if r < err / 3:
            continue
        elif r < 2 * err / 3:
            out.append(rng.integers(0, 4))
            out.append(c)
        elif r < err:
            out.append(rng.integers(0, 4))
        else:
            out.append(c)
    return np.array(out, dtype=np.uint8) if out else np.array(
        [0], dtype=np.uint8)


def test_exact_repeats():
    rng = np.random.default_rng(0)
    for L in (1, 2, 5, 30, 100):
        unit = rng.integers(0, 4, L).astype(np.uint8)
        for n in (1, 2, 3, 8):
            _assert_parity([unit.copy() for _ in range(n)])


@pytest.mark.parametrize("err", [0.05, 0.15, 0.25, 0.4])
@pytest.mark.parametrize("L", [8, 37, 120])
def test_fuzz_noisy(err, L):
    rng = np.random.default_rng(hash((err, L)) % 2**31)
    for trial in range(6):
        unit = rng.integers(0, 4, L).astype(np.uint8)
        n = int(rng.integers(2, 9))
        units = [_mutate(unit, err, rng) for _ in range(n)]
        _assert_parity(units)


def test_with_n_bases():
    rng = np.random.default_rng(7)
    for trial in range(8):
        L = int(rng.integers(5, 60))
        unit = rng.integers(0, 5, L).astype(np.uint8)  # includes N=4
        n = int(rng.integers(2, 6))
        units = [_mutate(unit, 0.2, rng) for _ in range(n)]
        _assert_parity(units)


def test_divergent_lengths():
    rng = np.random.default_rng(11)
    for trial in range(6):
        units = [rng.integers(0, 4, int(rng.integers(1, 80))).astype(np.uint8)
                 for _ in range(int(rng.integers(2, 7)))]
        _assert_parity(units)


def test_dispatch_default_is_native(monkeypatch):
    # msa_consensus routes through the C walk unless TH_POA_NATIVE=0
    from tidehunter_tpu.ops.poa import msa_consensus

    rng = np.random.default_rng(3)
    unit = rng.integers(0, 4, 50).astype(np.uint8)
    units = [_mutate(unit, 0.1, rng) for _ in range(4)]
    monkeypatch.delenv("TH_POA_NATIVE", raising=False)
    c1, v1 = msa_consensus(units, **SCORES)
    monkeypatch.setenv("TH_POA_NATIVE", "0")
    c2, v2 = msa_consensus(units, **SCORES)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(v1, v2)
