"""Wavefront kernel family v2 (ops/wavefront.py) vs the NumPy oracle.

The forward-annotation 'global' variant and the accumulator-based 'ext'
variant must reproduce ops/ksw2.py exactly: identity counts, the
backtrack_left_end projection for every qle in [0, qlen], the extension
max with the reference's SIMD row-scan tie order, and the global score.

Pallas TPU kernels only lower on the TPU backend; on the CPU test mesh the
module import is still exercised and the test skips.
"""

import numpy as np
import pytest

from tidehunter_tpu.ops import ksw2


def _make_batch(rng, B, LQ, LT, sim):
    q = np.full((B, LQ), 4, np.uint8)
    t = np.full((B, LT), 4, np.uint8)
    qlen = np.ones(B, np.int32)
    tlen = np.ones(B, np.int32)
    qle = np.zeros(B, np.int32)
    oracle = []
    for b in range(B):
        m = int(rng.integers(1, LQ + 1))
        n = int(rng.integers(1, LT + 1))
        if b == 0:
            m, n = 1, 1
        if b == 1:
            m, n = LQ, 1
        if b == 2:
            m, n = 1, LT
        qs = rng.integers(0, 5, m).astype(np.uint8)
        ts = rng.integers(0, 5, n).astype(np.uint8)
        if sim and m <= n:
            ts[:m] = qs
        q[b, :m] = qs
        t[b, :n] = ts
        qlen[b], tlen[b] = m, n
        qle[b] = [0, m, int(rng.integers(0, m + 1))][b % 3]
        iden, cig = ksw2.global_with_cigar(qs, ts)
        tle = ksw2.backtrack_left_end(cig, int(qle[b]))
        rs = ksw2.extz(qs, ts, score_only=True)
        r = ksw2.extz(qs, ts)
        oracle.append((iden, tle, rs.max, rs.max_t, rs.max_q, r.score))
    return q, qlen, t, tlen, qle, oracle


def test_wavefront_interpret_smoke(monkeypatch):
    """Pallas interpret-mode run on CPU: enforces the kernel-vs-oracle
    parity contract in CPU-only CI (hardware runs remain the gate for
    production shapes). Small tiles keep the interpreter fast."""
    from tidehunter_tpu.ops import wavefront as WF

    monkeypatch.setattr(WF, "INTERPRET", True)
    monkeypatch.setattr(WF, "_TILE_CELLS", 1024)  # tile_b -> 8 rows
    rng = np.random.default_rng(7)
    B = WF.tile_b(32)
    q, qlen, t, tlen, qle, oracle = _make_batch(rng, B, 32, 32, True)
    giden, gtle = WF.global_batch(q, qlen, t, tlen, qle)
    mx, mt, mq, sc = WF.ext_batch(q, qlen, t, tlen)
    ionly, _z = WF.global_batch(q, qlen, t, tlen, qle, iden_only=True)
    giden, gtle, mx, mt, mq, sc, ionly = map(
        np.asarray, (giden, gtle, mx, mt, mq, sc, ionly)
    )
    for b, o in enumerate(oracle):
        assert (giden[b], gtle[b]) == (o[0], o[1])
        assert ionly[b] == o[0]
        assert (mx[b], mt[b], mq[b], sc[b]) == (o[2], o[3], o[4], o[5])


@pytest.mark.parametrize("seed,sim", [(0, True), (1, False)])
def test_wavefront_matches_oracle(seed, sim):
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("wavefront kernels lower on TPU only")
    from tidehunter_tpu.ops import wavefront as WF

    rng = np.random.default_rng(seed)
    q, qlen, t, tlen, qle, oracle = _make_batch(rng, 16, 128, 128, sim)
    giden, gtle = WF.global_batch(q, qlen, t, tlen, qle)
    mx, mt, mq, sc = WF.ext_batch(q, qlen, t, tlen)
    ionly, _z = WF.global_batch(q, qlen, t, tlen, qle, iden_only=True)
    giden, gtle, mx, mt, mq, sc, ionly = map(
        np.asarray, (giden, gtle, mx, mt, mq, sc, ionly)
    )
    for b, o in enumerate(oracle):
        assert (giden[b], gtle[b]) == (o[0], o[1])
        assert ionly[b] == o[0]
        assert (mx[b], mt[b], mq[b], sc[b]) == (o[2], o[3], o[4], o[5])
