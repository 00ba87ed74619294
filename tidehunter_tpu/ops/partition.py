"""Unit partitioning: split a chained tandem-repeat region into unit copies.

Oracle of the reference's narrow-global-alignment partition walk
(get_partition_pos_with_narrow_global_alignment, reference
src/partition.c:171-276): starting from the chain's representative anchor
(est_start, est_start + est_period), walk the chain left then right; adjacent
anchors whose hits exactly abut split for free; otherwise globally align the
two flanking k-extended windows and project the split point through the
cigar (ksw2_backtrack_left_end). A rejected alignment (identity below
(1-max_div)*min(len)) inserts a -1 separator and restarts coordinates, so a
single chain can yield several TR regions.

The batched TPU path runs the window alignments through the Pallas wavefront
kernel bucketed by window length; the walk itself is host control flow.
"""

from __future__ import annotations

from typing import List

import numpy as np

from . import ksw2
from .chaining import Chain, DpGrid


def partition_positions(
    bseq: np.ndarray,
    seq_len: int,
    dp: DpGrid,
    ch: Chain,
    k: int,
    max_div: float,
    aligner=None,
) -> List[int]:
    """Returns par_pos, the ordered list of 0-based unit split points with -1
    separators (reference src/partition.c:171-276).

    `aligner(query, target) -> (iden_n, cigar)` defaults to the ksw2 oracle;
    the TPU runner injects a batched device-backed implementation.
    """
    align = aligner if aligner is not None else ksw2.global_with_cigar
    est_ch_i = ch.est_ch_i
    est_start = ch.est_start
    est_period = ch.est_period
    first_end = int(dp.end[ch.cells[0]])
    last_start = int(dp.start[ch.cells[-1]])
    par_pos: List[int] = []

    # left extension: find S  (partition.c:186-224)
    ch_i, s, e = est_ch_i, est_start, est_start + est_period
    while s >= first_end and ch_i > 0:
        s2, e2 = s, e
        for i in range(ch_i - 1, -1, -1):
            d_start = int(dp.start[ch.cells[i]])
            d_end = int(dp.end[ch.cells[i]])
            s1, e1 = d_start, d_end
            if e1 == s:
                par_pos.append(s1)
                ch_i, s, e = i, s1, e1
                break
            elif e1 < s:
                # query = bseq[e1-k+1 .. e2] (len e2-e1+k), target likewise
                iden_n, cigar = align(
                    bseq[e1 - k + 1 : e2 + 1], bseq[s1 - k + 1 : s2 + 1]
                )
                if iden_n >= min(s2 - s1 + k, e2 - e1 + k) * (1 - max_div):
                    e = s
                    s = s2 - ksw2.backtrack_left_end(cigar, e2 - s)
                    if e == s:  # no backtrack progress
                        ch_i = 0
                        break
                    par_pos.append(s)
                    ch_i = i + 1
                else:  # skip this anchor: separator + restart
                    par_pos.append(-1)
                    par_pos.append(e1)
                    par_pos.append(s1)
                    ch_i, s, e = i, s1, e1
                break
            else:
                s2, e2 = s1, e1

    par_pos.reverse()
    par_pos.append(est_start)
    par_pos.append(est_start + est_period)

    # right extension: find E  (partition.c:236-273)
    ch_i, s, e = est_ch_i, est_start, est_start + est_period
    while ch_i < len(ch.cells) - 1 and e <= last_start:
        s1, e1 = s, e
        for i in range(ch_i + 1, len(ch.cells)):
            d_start = int(dp.start[ch.cells[i]])
            d_end = int(dp.end[ch.cells[i]])
            s2, e2 = d_start, d_end
            if s2 == e:
                par_pos.append(e2)
                ch_i, s, e = i, s2, e2
                break
            elif s2 > e:
                iden_n, cigar = align(
                    bseq[s1 - k + 1 : s2 + 1], bseq[e1 - k + 1 : e2 + 1]
                )
                if iden_n >= min(s2 - s1 + k, e2 - e1 + k) * (1 - max_div):
                    s = e
                    e = e2 - ksw2.backtrack_left_end(cigar, s2 - e)
                    if e == s:
                        ch_i = len(ch.cells)
                        break
                    par_pos.append(e)
                    ch_i = i - 1
                else:
                    par_pos.append(-1)
                    par_pos.append(s2)
                    par_pos.append(e2)
                    ch_i, s, e = i, s2, e2
                break
            else:
                s1, e1 = s2, e2
    return par_pos
