"""Device chain-DP parity vs the sequential oracle.

chain_dp_batch (ops/chaining_jax.py) must reproduce the reference chain
DP's per-cell (score, from) exactly on every read it does NOT flag for
fallback, and the host post-processing entry (tandem_chain_from_dp →
native th_chain_post) must then select the exact same chains as the full
host chainer. Flagged rows are rerouted to the host path by the engine,
so the only correctness obligation there is that the flag fires.

Ground truth: ops/chaining.tandem_chain (the bit-exact oracle of
reference src/tandem_chain.c:290-404, itself golden-tested in
tests/test_chain_partition_golden.py).
"""

import numpy as np
import pytest

from tidehunter_tpu.io.codec import encode
from tidehunter_tpu.io.fastx import read_fastx
from tidehunter_tpu.ops.chaining import tandem_chain
from tidehunter_tpu.ops.chaining_jax import chain_dp_batch
from tidehunter_tpu.ops.chaining_native import (
    tandem_chain_from_dp,
    tandem_chain_native,
)
from tidehunter_tpu.ops.seeding import collect_tandem_repeat_hits


def _random_read(rng):
    kind = rng.integers(0, 4)
    if kind == 0:
        return rng.integers(0, 4, int(rng.integers(50, 800))).astype(np.uint8)
    unit_len = int(rng.integers(30, 300))
    copies = int(rng.integers(2, 8))
    err = float(rng.choice([0.0, 0.05, 0.15]))
    unit = rng.integers(0, 4, unit_len).astype(np.uint8)
    parts = [rng.integers(0, 4, int(rng.integers(0, 80))).astype(np.uint8)]
    for _ in range(copies):
        out = []
        for c in unit:
            r = rng.random()
            if r < err / 3:
                continue
            elif r < 2 * err / 3:
                out.extend([int(rng.integers(0, 4)), int(c)])
            elif r < err:
                out.append(int(rng.integers(0, 4)))
            else:
                out.append(int(c))
        parts.append(np.array(out, np.uint8))
    parts.append(rng.integers(0, 4, int(rng.integers(0, 80))).astype(np.uint8))
    return np.concatenate(parts)


def _hits(bseq, k=8):
    return collect_tandem_repeat_hits(bseq, k, 1, False, 30, 10000)


def _batch(hit_list, L=None):
    B = len(hit_list)
    L = L or max(max((len(e) for e, _ in hit_list), default=1), 2)
    ends = np.full((B, L), np.iinfo(np.int32).max, np.int32)
    pers = np.full((B, L), np.iinfo(np.int32).max, np.int32)
    cnt = np.zeros(B, np.int32)
    for i, (e, p) in enumerate(hit_list):
        ends[i, : len(e)] = e
        pers[i, : len(p)] = p
        cnt[i] = len(e)
    return ends, pers, cnt


def _chain_key(chains):
    return [
        (list(map(int, ch.cells)), ch.est_period, ch.est_start)
        for ch in chains
    ]


def _check_parity(hit_list, k=8, window=512, min_exact=1, L=None):
    """Runs the device DP on a batch; asserts bit-parity on all
    non-fallback rows and returns how many rows were exact."""
    ends, pers, cnt = _batch(hit_list, L=L)
    score, from_idx, fb = chain_dp_batch(ends, pers, cnt, k=k, window=window)
    score = np.asarray(score)
    from_idx = np.asarray(from_idx)
    fb = np.asarray(fb)
    n_exact = 0
    for i, (e, p) in enumerate(hit_list):
        if len(e) < 2 or fb[i]:
            continue
        n_exact += 1
        dp, want = tandem_chain(np.asarray(e), np.asarray(p), k)
        n = len(e)
        np.testing.assert_array_equal(
            score[i, :n], dp.score, err_msg=f"row {i} score"
        )
        np.testing.assert_array_equal(
            from_idx[i, :n], dp.from_idx, err_msg=f"row {i} from"
        )
        _, got = tandem_chain_from_dp(
            np.asarray(e), np.asarray(p),
            score[i, :n].astype(np.int64),
            from_idx[i, :n].astype(np.int64), k,
        )
        assert _chain_key(got) == _chain_key(want), f"row {i} chains"
    assert n_exact >= min_exact, "test is vacuous: everything fell back"
    return n_exact


def test_testdata_golden(test_data):
    """With window >= padded hit count, the front pad guarantees an event
    inside every window, so exactness is unconditional: all three
    test_data reads must match bit-for-bit (scores, from pointers, and
    selected chains)."""
    hit_list = []
    for name in ("test_50x4.fa", "test_1000x10.fa", "full_length.fa"):
        rec = next(read_fastx(str(test_data / name)))
        hit_list.append(_hits(encode(rec.seq)))
    n = _check_parity(hit_list, window=4096, L=4096, min_exact=3)
    assert n == 3


def test_fuzz_corpus():
    rng = np.random.default_rng(7)
    hit_list = [_hits(_random_read(rng)) for _ in range(48)]
    hit_list = [(e, p) for e, p in hit_list if len(e) >= 2]
    assert len(hit_list) >= 20
    _check_parity(hit_list, min_exact=len(hit_list) // 2)


def test_fallback_flags_nonsingleton_groups():
    # two hits sharing an end position -> non-singleton group -> fallback
    ends = np.array([[100, 200, 200, 300]], np.int32)
    pers = np.array([[50, 50, 60, 50]], np.int32)
    cnt = np.array([4], np.int32)
    _, _, fb = chain_dp_batch(ends, pers, cnt, k=8, window=64)
    assert bool(np.asarray(fb)[0])


def test_small_window_falls_back_not_wrong():
    """With a tiny window, rows either match exactly or raise the flag —
    never silently wrong."""
    rng = np.random.default_rng(11)
    hit_list = [_hits(_random_read(rng)) for _ in range(24)]
    hit_list = [(e, p) for e, p in hit_list if len(e) >= 2]
    _check_parity(hit_list, window=64, min_exact=1)


def test_post_matches_native_full():
    """tandem_chain_from_dp over oracle-computed DP == tandem_chain_native."""
    rng = np.random.default_rng(13)
    for _ in range(12):
        e, p = _hits(_random_read(rng))
        if len(e) < 2:
            continue
        dp, want = tandem_chain_native(e, p, 8)
        dpo, _ = tandem_chain(np.asarray(e), np.asarray(p), 8)
        _, got = tandem_chain_from_dp(
            np.asarray(e), np.asarray(p), dpo.score, dpo.from_idx, 8
        )
        assert _chain_key(got) == _chain_key(want)


def test_engine_device_chain_matches_oracle(monkeypatch, test_data):
    """Engine with device seeding AND device chaining == host oracle on
    real data plus fuzz reads (the full VERDICT r2 item-2 wiring)."""
    monkeypatch.setenv("TH_DEVICE_SEED", "1")
    monkeypatch.setenv("TH_DEVICE_CHAIN", "1")
    from tidehunter_tpu.engine import Engine
    from tidehunter_tpu.io.codec import decode
    from tidehunter_tpu.io.fastx import FastxRecord
    from tidehunter_tpu.params import Params
    from tidehunter_tpu.pipeline.core import tidehunter_core

    rng = np.random.default_rng(21)
    reads = list(read_fastx(str(test_data / "test_50x4.fa"))) + list(
        read_fastx(str(test_data / "test_1000x10.fa"))
    )
    reads += [
        FastxRecord(name=f"f{i}", comment="", seq=decode(_random_read(rng)))
        for i in range(8)
    ]
    mtp = Params()
    engine = Engine(mtp, platform="cpu")
    results = engine(reads, mtp)
    for rec, res in zip(reads, results):
        want = tidehunter_core(rec.seq, mtp)
        got = [(c.seq, c.start, c.end, tuple(c.sub_pos)) for c in res.records]
        exp = [(c.seq, c.start, c.end, tuple(c.sub_pos)) for c in want.records]
        assert got == exp, rec.name
