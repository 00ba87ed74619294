"""Consensus-fidelity gate: production profile-POA >= graph-POA − ε.

VERDICT r2 item 4: the one reference component this rebuild replaced
rather than matched is abPOA's graph-POA consensus
(reference src/abpoa_cons.c:30-120); the production MSA is a profile-POA
reformulation (ops/poa_profile.py). This test pins the fidelity claim as
a regression gate instead of an assertion: on paired reads (identical
inputs through both engines) the profile consensus's mean
rotation-invariant identity to the true unit must not trail the
graph-POA oracle (ops/poa.py) by more than EPS.

Configs are drawn from the paper protocol corners
(reference simulation/README.md:17-41) where the two models could
plausibly diverge: short units (100), mid units at default error, and
the low-copy regime that exercises the n<=2 fast path.

The full 15-config / 1000-read sweep lives in evals/accuracy.py
(--msa graph for the oracle axis); results in evals/RESULTS.md.
"""

import numpy as np
import pytest

from tidehunter_tpu.params import Params


EPS = 1.5  # percentage points of mean identity

CONFIGS = [
    # (err, unit_len, copies, n_reads)
    (0.15, 100, 10, 10),
    (0.15, 500, 10, 6),
    (0.15, 1000, 3, 5),
]


def _identity(cons: str, unit: str) -> float:
    from tidehunter_tpu.ops.myers import align_hw

    if not cons:
        return 0.0
    ed, _, _ = align_hw(cons, unit + unit, -1)
    return max(0.0, 1.0 - ed / len(cons))


def _run(reads, mtp):
    from tidehunter_tpu.pipeline.core import tidehunter_core

    return [tidehunter_core(seq, mtp) for seq in reads]


@pytest.mark.parametrize("err,unit_len,copies,n_reads", CONFIGS)
def test_profile_not_worse_than_graph(monkeypatch, err, unit_len, copies,
                                      n_reads):
    import sys
    sys.path.insert(0, "evals")
    from accuracy import make_read

    rng = np.random.default_rng(hash((err, unit_len, copies)) % 2**31)
    reads, units = [], []
    for _ in range(n_reads):
        seq, unit = make_read(rng, err, unit_len, copies)
        reads.append(seq)
        units.append(unit)
    mtp = Params()

    monkeypatch.delenv("TH_MSA", raising=False)
    prof = _run(reads, mtp)
    monkeypatch.setenv("TH_MSA", "graph")
    graph = _run(reads, mtp)

    def best_iden(res, unit):
        recs = [r for r in res.records if not r.is_unit]
        if not recs:
            return None
        best = max(recs, key=lambda r: r.end - r.start)
        return 100.0 * _identity(best.seq, unit)

    diffs = []
    for p, g, unit in zip(prof, graph, units):
        ip, ig = best_iden(p, unit), best_iden(g, unit)
        # detection itself is MSA-independent (seeding/chaining/partition
        # run before the consensus stage); both or neither detect
        assert (ip is None) == (ig is None)
        if ip is not None:
            diffs.append(ip - ig)
    assert diffs, "no detections — gate is vacuous"
    mean_diff = float(np.mean(diffs))
    assert mean_diff >= -EPS, (
        f"profile-POA trails graph-POA by {-mean_diff:.2f}% mean identity "
        f"(gate: {EPS}%) at err={err} unit={unit_len} copies={copies}"
    )
