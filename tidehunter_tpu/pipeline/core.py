"""Per-read pipeline: seed -> chain -> partition -> consensus.

Orchestration mirror of the reference core (tidehunter_core, reference
src/tidehunter.c:23-60). This is the host-side oracle path; the TPU runner
(pipeline/runner.py) executes the same stages with batched device kernels
and falls back to these routines per read.
"""

from __future__ import annotations

import numpy as np

from ..io.codec import encode
from ..io.output import TandemResult
from ..params import Params
from ..ops.chaining import tandem_chain
from ..ops.partition import partition_positions
from ..ops.seeding import collect_tandem_repeat_hits
from .consensus import seqs_msa, single_copy_full_len_seq


def tidehunter_core(read_seq: str, mtp: Params) -> TandemResult:
    """Process one read; returns its TandemResult (record accumulator)."""
    result = TandemResult()
    seq_len = len(read_seq)
    if seq_len < mtp.k:
        return result
    bseq = encode(read_seq)

    ends, periods = collect_tandem_repeat_hits(
        bseq, mtp.k, mtp.w, mtp.hpc, mtp.min_p, mtp.max_p
    )
    dp, chains = tandem_chain(ends, periods, mtp.k)
    for ch in chains:
        par_pos = partition_positions(
            bseq, seq_len, dp, ch, mtp.k, mtp.max_div
        )
        if len(par_pos) < mtp.min_copy + 1:
            continue  # not enough copies (tidehunter.c:42)
        seqs_msa(seq_len, bseq, par_pos, result, mtp)

    if (
        mtp.single_copy
        and mtp.only_full_length
        and mtp.five_seq is not None
        and mtp.three_seq is not None
    ):
        single_copy_full_len_seq(read_seq, result, mtp)
    return result
