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


def test_walk_right_native_vs_generator():
    """The C whole-walk (th_walk_right) must produce the generator's
    par_pos right half exactly, on real seeded/chained tandem reads."""
    from tidehunter_tpu.io.codec import encode
    from tidehunter_tpu.ops.chaining_native import tandem_chain_native
    from tidehunter_tpu.ops.ksw2_native import walk_right_native
    from tidehunter_tpu.ops.partition import partition_walk_right
    from tidehunter_tpu.ops.seeding_native import (
        collect_tandem_repeat_hits,
    )

    rng = np.random.default_rng(3)

    def synth(unit_len, copies, err):
        unit = rng.integers(0, 4, unit_len).astype(np.uint8)
        parts = [rng.integers(0, 4, 80).astype(np.uint8)]
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
        parts.append(rng.integers(0, 4, 80).astype(np.uint8))
        return np.concatenate(parts)

    checked = 0
    for unit_len, copies, err in [
        (120, 6, 0.10), (60, 10, 0.20), (300, 4, 0.13), (45, 8, 0.05),
        (150, 5, 0.25),
    ]:
        for _ in range(4):
            b = synth(unit_len, copies, err)
            hits = collect_tandem_repeat_hits(b, 8, 1, False, 30, 2000)
            dp, chains = tandem_chain_native(*hits, 8)
            for ch in chains:
                cells = np.asarray(ch.cells)
                starts_a = dp.start[cells]
                ends_a = dp.end[cells]
                got = walk_right_native(
                    b, starts_a, ends_a, ch.est_start, ch.est_period,
                    8, 0.25, 192,
                )
                gen = partition_walk_right(b, len(b), dp, ch, 8, 0.25)
                exp = None
                try:
                    req = gen.send(None)
                    while True:
                        from tidehunter_tpu.ops.partition import (
                            _oracle_align,
                        )

                        req = gen.send(_oracle_align(req))
                except StopIteration as stop:
                    exp = stop.value
                if got is None:
                    # legal fallback (oversize window); generator is the
                    # production fallback there
                    continue
                assert got == exp, (unit_len, copies, err)
                checked += 1
    assert checked >= 20


def test_degenerate_lengths():
    q = np.array([0, 1, 2], np.uint8)
    t = np.array([0, 1, 2], np.uint8)
    one = np.array([3], np.uint8)
    got = global_tleft_batch([(q, t, 2), (one, one, 0), (one, t, 1)])
    exp = [_oracle(q, t, 2), _oracle(one, one, 0), _oracle(one, t, 1)]
    assert got == exp
