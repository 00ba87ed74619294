"""Star-MSA consensus from batched device alignments.

TPU-native reformulation of the POA consensus stage: instead of a
sequentially-grown alignment graph (host oracle, ops/poa.py), every unit of
every TR region is globally aligned against that region's template with ONE
batched wavefront kernel call per length bucket, MSA columns are built from
the returned op-strings with vectorized NumPy, and majority voting gives the
consensus + per-base coverage. One or two refinement rounds (realign against
the round's consensus) recover POA-grade accuracy; on exact repeats the
result is identical to the POA oracle by construction.

Semantics preserved from the abPOA contract (reference src/abpoa_cons.c):
majority base per column, column dropped when gaps outnumber the best base,
coverage = #units supporting the consensus base.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

MAX_INS = 8


def accumulate_alignment(
    counts: np.ndarray,
    ins_counts: np.ndarray,
    unit: np.ndarray,
    ops_rl: np.ndarray,
    n_steps: int,
) -> None:
    """Add one unit-vs-template alignment to the column counts.

    ops_rl: right-to-left op codes from the device backtrack
    (0=M, 1=D consumes template, 2=I consumes unit)."""
    ops = ops_rl[:n_steps][::-1].astype(np.int64)
    tstep = ops != 2
    qstep = ops != 1
    ipos = np.cumsum(tstep) - 1
    jpos = np.cumsum(qstep) - 1
    m = ops == 0
    if m.any():
        np.add.at(counts, (ipos[m], unit[jpos[m]]), 1)
    ins = ops == 2
    if ins.any():
        idx = np.arange(len(ops))
        last_non_ins = np.maximum.accumulate(np.where(~ins, idx, -1))
        offs = (idx - last_non_ins - 1)[ins]
        boundary = ipos[ins] + 1
        bases = unit[jpos[ins]]
        keep = offs < MAX_INS
        np.add.at(
            ins_counts, (boundary[keep], offs[keep], bases[keep]), 1
        )


def consensus_from_counts(
    counts: np.ndarray, ins_counts: np.ndarray, n_units: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Majority vote per column; inserted columns require a strict majority
    run from offset 0. Returns (cons_bases uint8, coverage int64)."""
    Lt = counts.shape[0]
    best = counts.argmax(axis=1)
    bc = counts[np.arange(Lt), best]
    gap = n_units - counts.sum(axis=1)
    keep_main = bc > gap

    # insertion columns: per boundary, offsets kept while a strict majority
    # holds contiguously from offset 0
    ib = ins_counts.argmax(axis=2)                        # [Lt+1, MAX_INS]
    ic = np.take_along_axis(ins_counts, ib[..., None], 2)[..., 0]
    qual = ic * 2 > n_units
    qual = np.logical_and.accumulate(qual, axis=1)
    ii, kk = np.nonzero(qual)

    # assemble in order: inserts before column i, then column i
    # sort key: (position, is_main, offset)
    main_i = np.nonzero(keep_main)[0]
    key_main = main_i * (MAX_INS + 2) + MAX_INS + 1
    key_ins = ii * (MAX_INS + 2) + kk
    keys = np.concatenate([key_main, key_ins])
    bases = np.concatenate([best[main_i], ib[ii, kk]])
    covs = np.concatenate([bc[main_i], ic[ii, kk]])
    order = np.argsort(keys, kind="stable")
    return bases[order].astype(np.uint8), covs[order].astype(np.int64)


def star_msa_round(
    regions: List[List[np.ndarray]],
    templates: List[np.ndarray],
    run_ops_batch,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """One realignment round: align every unit to its region's template,
    rebuild counts, vote. run_ops_batch(pairs) resolves a list of
    (query, target) into (ops_rl, n_steps) via the batched device kernel."""
    pairs = []
    index = []
    for ri, (units, tmpl) in enumerate(zip(regions, templates)):
        for u in units:
            pairs.append((u, tmpl))
            index.append(ri)
    results = run_ops_batch(pairs)
    out = []
    pos = 0
    for ri, (units, tmpl) in enumerate(zip(regions, templates)):
        counts = np.zeros((len(tmpl), 5), np.int64)
        ins_counts = np.zeros((len(tmpl) + 1, MAX_INS, 5), np.int64)
        for u in units:
            ops_rl, n = results[pos]
            pos += 1
            accumulate_alignment(counts, ins_counts, u.astype(np.int64), ops_rl, int(n))
        out.append(consensus_from_counts(counts, ins_counts, len(units)))
    return out
