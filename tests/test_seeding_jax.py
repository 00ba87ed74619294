"""Device seeding (ops/seeding_jax.py) vs the host oracle (ops/seeding.py).

The device path must be bit-exact per read for the direct-hash modes
(w == 1, HPC on/off) across read lengths, N content, and period bounds —
including padded batches of mixed lengths.
"""

import numpy as np
import pytest

from tidehunter_tpu.ops.seeding import collect_tandem_repeat_hits
from tidehunter_tpu.ops.seeding_jax import collect_hits_batch_host


def _random_reads(rng, n, max_len, n_frac=0.02, tandem=True):
    reads = []
    for _ in range(n):
        L = int(rng.integers(5, max_len))
        if tandem and L > 60 and rng.random() < 0.7:
            p = int(rng.integers(20, max(21, L // 3)))
            unit = rng.integers(0, 4, p)
            reps = L // p + 1
            seq = np.tile(unit, reps)[:L]
            # sprinkle errors
            err = rng.random(L) < 0.1
            seq = np.where(err, rng.integers(0, 4, L), seq)
        else:
            seq = rng.integers(0, 4, L)
        ns = rng.random(L) < n_frac
        seq = np.where(ns, 4, seq).astype(np.uint8)
        reads.append(seq)
    return reads


@pytest.mark.parametrize("k,w,hpc,min_p,max_p", [
    (8, 1, False, 30, 10000),
    (8, 1, True, 30, 10000),
    (5, 1, False, 2, 50),
    (13, 1, False, 30, 200),
    (16, 1, False, 30, 10000),
    (8, 5, False, 30, 10000),
    (8, 5, True, 30, 10000),
    (8, 2, False, 30, 10000),
    (13, 10, False, 2, 10000),
    (16, 3, False, 30, 10000),
])
def test_device_seeding_matches_oracle(k, w, hpc, min_p, max_p):
    rng = np.random.default_rng(k * 1000 + w * 77 + min_p)
    reads = _random_reads(rng, 24, 700)
    # include degenerate shapes: tiny read, all-N read, poly-T read
    # (poly-T stresses the k=16 key == uint32 sentinel corner; with
    # w > 1 N-reads must round-trip through the fallback reroute)
    reads += [
        np.zeros(3, np.uint8),
        np.full(80, 4, np.uint8),
        np.full(90, 3, np.uint8),
    ]
    got = collect_hits_batch_host(
        reads, k=k, w=w, use_hpc=hpc, min_p=min_p, max_p=max_p
    )
    for r, (ge, gp) in zip(reads, got):
        we, wp = collect_tandem_repeat_hits(r, k, w, hpc, min_p, max_p)
        np.testing.assert_array_equal(ge, we)
        np.testing.assert_array_equal(gp, wp)


def test_device_seeding_golden_counts(test_data):
    """Hit counts pinned against the reference's own compiled seeder
    (tests/test_chain_partition_golden.py run())."""
    from tidehunter_tpu.io.codec import encode
    from tidehunter_tpu.io.fastx import read_fastx

    expected = {
        "test_50x4.fa": 196,
        "full_length.fa": 3452,
        "test_1000x10.fa": 3055,
    }
    reads = []
    names = []
    for fn in expected:
        rec = next(read_fastx(str(test_data / fn)))
        reads.append(encode(rec.seq))
        names.append(fn)
    got = collect_hits_batch_host(
        reads, k=8, w=1, use_hpc=False, min_p=30, max_p=10000
    )
    for fn, (ge, gp) in zip(names, got):
        assert len(ge) == expected[fn], fn


def test_engine_device_seed_matches_host(monkeypatch, test_data):
    """Engine with device seeding == host-oracle pipeline on real data."""
    monkeypatch.setenv("TH_DEVICE_SEED", "1")
    from tidehunter_tpu.engine import Engine
    from tidehunter_tpu.io.fastx import read_fastx
    from tidehunter_tpu.params import Params
    from tidehunter_tpu.pipeline.core import tidehunter_core

    reads = list(read_fastx(str(test_data / "test_50x4.fa"))) + list(
        read_fastx(str(test_data / "test_1000x10.fa"))
    )
    mtp = Params()
    engine = Engine(mtp, platform="cpu")
    results = engine(reads, mtp)
    for rec, res in zip(reads, results):
        want = tidehunter_core(rec.seq, mtp)
        got = [(c.seq, c.start, c.end, tuple(c.sub_pos)) for c in res.records]
        exp = [(c.seq, c.start, c.end, tuple(c.sub_pos)) for c in want.records]
        assert got == exp
