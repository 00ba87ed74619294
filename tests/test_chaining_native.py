"""Property test: native chain DP (native/chainx.c, incl. the prefix-max
upper-bound prune) is chain-identical to the Python oracle
(ops/chaining.py) on randomized hit streams.

Two regimes:
- synth reads through the seeder (singleton end-groups -> the AVX-512
  fast path when available);
- raw random hit arrays WITH duplicate end positions (multi-hit end
  groups -> the scalar grouped path; the reference allows several hits
  per end when w > 1, reference src/tandem_hit.c:126-147).
"""

from __future__ import annotations

import numpy as np
import pytest

from tidehunter_tpu.io.codec import encode
from tidehunter_tpu.ops.chaining import tandem_chain as py_chain
from tidehunter_tpu.ops.chaining_native import tandem_chain_native
from tidehunter_tpu.ops.seeding import collect_tandem_repeat_hits
from tidehunter_tpu.params import Params


def _assert_chains_equal(native, oracle) -> None:
    assert len(native) == len(oracle)
    for a, b in zip(native, oracle):
        assert np.array_equal(np.asarray(a.cells), np.asarray(b.cells))
        assert a.est_period == b.est_period
        assert a.est_start == b.est_start
        assert a.est_ch_i == b.est_ch_i


def _synth(rng, unit_len, copies, err, flank):
    # local tandem-read generator (mirrors bench.synth_read; kept here so
    # tests don't import the bench script)
    unit = rng.integers(0, 4, unit_len).astype(np.uint8)
    parts = [rng.integers(0, 4, flank).astype(np.uint8)]
    for _ in range(copies):
        out = []
        for c in unit:
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
        parts.append(np.array(out, dtype=np.uint8))
    parts.append(rng.integers(0, 4, flank).astype(np.uint8))
    return np.concatenate(parts)


@pytest.mark.parametrize("seed", range(8))
def test_native_matches_oracle_on_seeded_reads(seed):
    mtp = Params()
    rng = np.random.default_rng(1000 + seed)
    ul = int(rng.integers(30, 1200))
    cp = int(rng.integers(2, 10))
    err = float(rng.uniform(0.0, 0.22))
    bseq = _synth(rng, ul, cp, err, int(rng.integers(0, 150)))
    ends, periods = collect_tandem_repeat_hits(
        bseq, mtp.k, mtp.w, mtp.hpc, mtp.min_p, mtp.max_p
    )
    _, cn = tandem_chain_native(ends, periods, mtp.k)
    _, co = py_chain(ends, periods, mtp.k)
    _assert_chains_equal(cn, co)


@pytest.mark.parametrize("seed", range(8))
def test_native_matches_oracle_on_duplicate_end_groups(seed):
    """Random (end, period) streams with repeated ends: exercises the
    scalar grouped DP (the AVX path requires singleton groups)."""
    mtp = Params()
    rng = np.random.default_rng(2000 + seed)
    n = int(rng.integers(10, 400))
    ends = np.sort(rng.integers(40, 4000, n).astype(np.int64))
    # force duplicate end positions (multi-hit groups)
    dup = rng.random(n) < 0.35
    ends[1:][dup[1:]] = ends[:-1][dup[1:]]
    ends = np.sort(ends)
    periods = rng.integers(
        mtp.min_p, np.maximum(mtp.min_p + 1, np.minimum(ends - 1, 2000))
    ).astype(np.int64)
    # reference hit order: by end, then period
    order = np.lexsort((periods, ends))
    ends, periods = ends[order], periods[order]
    _, cn = tandem_chain_native(ends, periods, mtp.k)
    _, co = py_chain(ends, periods, mtp.k)
    _assert_chains_equal(cn, co)
