"""Consensus generation per tandem-repeat region.

Oracle of the reference consensus stage (reference src/gen_cons.c:173-301 and
src/abpoa_cons.c:30-120): for each maximal run of >= min_copy+1 non-negative
partition positions, build the unit MSA consensus, compute the average unit
identity (aveMatch) with global alignment against the consensus, extend the
TR boundary with extension alignment of the consensus against the flanking
read (fractional copy numbers), and resolve full-length orientation with
adapter searches on the doubled consensus (rotation-invariance trick,
gen_cons.c:227-233). Also implements the single-copy full-length path
(gen_cons.c:89-171).
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..io.codec import decode
from ..io.output import ConsRecord, TandemResult
from ..params import FASTQ_FMT, TAB_QUAL_FMT, Params
from ..ops import ksw2
from ..ops.myers import align_hw
from ..ops.poa import msa_consensus, sigmoid_phred_qual


def _msa_oracle(units: List[np.ndarray], mtp: Params):
    """Host resolution of an ('msa', units) request: profile-POA (matches or
    beats the graph-POA oracle on simulated accuracy; see ops/poa_profile.py).
    Set TH_MSA=graph to use the graph-POA (ops/poa.py) instead."""
    import os

    if os.environ.get("TH_MSA") == "graph":
        return msa_consensus(
            units,
            mtp.match,
            mtp.mismatch,
            mtp.gap_open1,
            mtp.gap_ext1,
            mtp.gap_open2,
            mtp.gap_ext2,
        )
    from ..ops.poa_profile import banded_profile_consensus

    return banded_profile_consensus(
        units, mtp.match, mtp.mismatch, mtp.gap_open1, mtp.gap_ext1,
        polish=getattr(mtp, "polish", 0),
        gap_open2=mtp.gap_open2, gap_ext2=mtp.gap_ext2,
    )


def _region_consensus_gen(
    bseq: np.ndarray, seq_len: int, pos: List[int], mtp: Params, want_qual: bool
):
    """abpoa_gen_cons equivalent (reference src/abpoa_cons.c:30-120) as a
    generator: yields an ('msa', units) request for n_seqs > 2.

    Returns (cons_bseq, cons_qual_or_None, n_seqs); cons length 0 = rejected.
    """
    units = []
    for i in range(len(pos) - 1):
        start, end = pos[i], pos[i + 1]
        if start < 0 or end < 0 or start >= seq_len - 1 or end + 1 > seq_len:
            continue
        units.append(bseq[start + 1 : end + 1])
    n_seqs = len(units)

    min_cov = 0
    if mtp.min_frac > 0.0:
        min_cov = int(n_seqs * mtp.min_frac)
    elif mtp.min_cov > 0:
        min_cov = mtp.min_cov

    if n_seqs <= 2:
        if n_seqs <= 1:
            raise RuntimeError("Not enough sequences to perform msa.")
        # fast path (abpoa_cons.c:60-83): first unit verbatim, qual '!'
        cons = units[0]
        if min_cov > 0:
            if len(units[0]) != len(units[1]) or not np.array_equal(
                units[0], units[1]
            ):
                cov_ok = 1
            else:
                cov_ok = 2
            if cov_ok < min_cov:
                return np.zeros(0, dtype=np.uint8), None, n_seqs
        qual = np.full(len(cons), 33, dtype=np.uint8) if want_qual else None
        return cons.copy(), qual, n_seqs

    cons, cov = yield ("msa", units)
    if min_cov > 0 and (cov < min_cov).any():
        return np.zeros(0, dtype=np.uint8), None, n_seqs
    qual = sigmoid_phred_qual(cov, n_seqs) if want_qual else None
    return cons, qual, n_seqs


def seqs_msa_gen(
    seq_len: int,
    bseq: np.ndarray,
    par_pos: List[int],
    result: TandemResult,
    mtp: Params,
):
    """Per-chain consensus over runs of partition positions
    (reference src/gen_cons.c:173-301), as a generator yielding requests:
      ('msa', units)            -> (cons, cov)
      ('gx', [(q,t)], [(q,t)])  -> ([iden_n], [(max_q, max_t)])
                                   (fused aveMatch + boundary ext round)
    """
    par_n = len(par_pos)
    want_qual = mtp.out_fmt in (FASTQ_FMT, TAB_QUAL_FMT)
    i = 0
    while i < par_n - mtp.min_copy:
        if par_pos[i] < 0:
            i += 1
            continue
        j = i + 1
        while j < par_n and par_pos[j] >= 0:
            j += 1
        if j - i > mtp.min_copy:
            if mtp.only_unit:
                result.add_unit(par_pos[i:j])
            else:
                # pos_run may gain recut boundaries in polish mode (below)
                pos_run = list(par_pos[i:j])
                rejected = False
                for recut_pass in range(2):
                    cons, qual, n_seqs = yield from _region_consensus_gen(
                        bseq, seq_len, pos_run, mtp, want_qual
                    )
                    cons_len = len(cons)
                    if cons_len == 0:
                        rejected = True
                        break
                    lengths = [
                        pos_run[ki + 1] - pos_run[ki]
                        for ki in range(len(pos_run) - 1)
                    ]
                    # aveMatch identities AND the boundary extensions
                    # (gen_cons.c:217-223; ksw2_left_ext reverses both
                    # sequences, src/ksw2_align.c:161-173) are mutually
                    # independent once cons is known — ONE fused request,
                    # so the engine resolves them in one dispatch round
                    idens, ((lq, lt), (rq, rt)) = yield (
                        "gx",
                        [
                            (bseq[pos_run[ki] + 1 : pos_run[ki + 1] + 1],
                             cons)
                            for ki in range(len(pos_run) - 1)
                        ],
                        [
                            (cons[::-1], bseq[: pos_run[0] + 1][::-1]),
                            (cons, bseq[pos_run[-1] + 1 :]),
                        ],
                    )
                    # BEYOND-REFERENCE recut (polish mode only): the
                    # anchor walk yields one unit fewer than the true
                    # copy count when no anchor starts past the last copy
                    # (at 3 copies the n<=2 fast path then emits the
                    # first unit verbatim, abpoa_cons.c:60-83 — the whole
                    # 3000x3 accuracy gap).  When boundary extension
                    # recovers >=85% of a period on either flank, adopt
                    # the extended span as an extra unit and redo the
                    # consensus once.
                    if recut_pass == 0 and getattr(mtp, "polish", 0) > 0:
                        addl = lt >= 0.85 * cons_len and pos_run[0] - lt >= -1
                        addr = rt >= 0.85 * cons_len
                        if addl or addr:
                            if addl:
                                pos_run = [pos_run[0] - lt] + pos_run
                            if addr:
                                pos_run = pos_run + [pos_run[-1] + rt]
                            continue
                    break
                if rejected:
                    # the reference's `continue` here re-enters with
                    # identical state (and with abPOA would loop
                    # forever); advance.
                    i = j + 1
                    continue
                ave_match = sum(
                    iden_n * 100 / float(length)
                    for iden_n, length in zip(idens, lengths)
                )
                copy_num = float(n_seqs)
                cons_start = pos_run[0] - lt
                copy_num += (lq + 1.0) / cons_len
                cons_end = pos_run[-1] + rt + 1
                copy_num += (rq + 1.0) / cons_len

                cons_seq = decode(cons)
                cons_qual = qual

                # full-length on the doubled consensus (gen_cons.c:226-291)
                full_length = 0
                if (
                    mtp.five_seq is not None
                    and mtp.three_seq is not None
                    and cons_len > mtp.five_len + mtp.three_len
                ):
                    cons_seq, cons_qual, full_length = (
                        yield from _full_length_trim_gen(
                            cons_seq, cons_qual, mtp
                        )
                    )
                    cons_len = len(cons_seq)

                if not mtp.only_full_length or full_length > 0:
                    rec = ConsRecord(
                        seq=cons_seq,
                        qual=bytes(cons_qual.tolist()).decode("latin1")
                        if cons_qual is not None
                        else None,
                        start=cons_start,
                        end=cons_end,
                        copy_num=copy_num,
                        # divisor = units actually summed (len(pos_run)-1;
                        # == j-i-1 except after a polish recut added units)
                        ave_match=ave_match / (len(pos_run) - 1),
                        full_length=full_length,
                        sub_pos=pos_run,
                    )
                    result.add_cons(rec, mtp)
        i = j + 1


def resolve_oracle(req, mtp: Params):
    """Resolve one consensus-stage request with the host oracle kernels."""
    kind = req[0]
    if kind == "msa":
        return _msa_oracle(req[1], mtp)
    if kind == "giden":
        return ksw2.global_identity(req[1], req[2])
    if kind == "gidens":
        return [ksw2.global_identity(q, t) for q, t in req[1]]
    if kind == "ext":
        # requests are pre-reversed for left extensions
        res = ksw2.extz(req[1], req[2], score_only=True)
        return res.max_q, res.max_t
    if kind == "exts":
        out = []
        for q, t in req[1]:
            res = ksw2.extz(q, t, score_only=True)
            out.append((res.max_q, res.max_t))
        return out
    if kind == "hws":
        return [align_hw(q, t, k) for q, t, k in req[1]]
    if kind == "gx":
        idens = [ksw2.global_identity(q, t) for q, t in req[1]]
        exts = []
        for q, t in req[2]:
            res = ksw2.extz(q, t, score_only=True)
            exts.append((res.max_q, res.max_t))
        return idens, exts
    raise ValueError(f"unknown request {kind}")


def seqs_msa(
    seq_len: int,
    bseq: np.ndarray,
    par_pos: List[int],
    result: TandemResult,
    mtp: Params,
) -> None:
    """Synchronous oracle wrapper around seqs_msa_gen."""
    gen = seqs_msa_gen(seq_len, bseq, par_pos, result, mtp)
    try:
        req = next(gen)
        while True:
            req = gen.send(resolve_oracle(req, mtp))
    except StopIteration:
        pass


def _full_length_trim(cons_seq: str, cons_qual, mtp: Params):
    """Synchronous wrapper around _full_length_trim_gen (host oracle)."""
    gen = _full_length_trim_gen(cons_seq, cons_qual, mtp)
    try:
        req = gen.send(None)
        while True:
            req = gen.send(resolve_oracle(req, mtp))
    except StopIteration as stop:
        return stop.value


def _full_length_trim_gen(cons_seq: str, cons_qual, mtp: Params):
    """Adapter search on 2x-concatenated consensus (gen_cons.c:227-291),
    as a generator: all four HW searches (5'/3'rc forward + the reverse
    pair) go out as ONE speculative 'hws' batch — the reference runs the
    reverse pair only when the forward total isn't perfect
    (gen_cons.c:256), but the extra searches are result-identical and
    resolve in the same device round.

    Returns (seq, qual, full_length in {0,1,2})."""
    cons_len = len(cons_seq)
    cons2 = cons_seq + cons_seq
    qual2 = (
        np.concatenate([cons_qual, cons_qual]) if cons_qual is not None else None
    )
    INT32_MAX = 2**31 - 1
    tar_start = tar_end = -1
    full_length = 0
    tot_ed = INT32_MAX

    k5 = int(mtp.five_len * (1 - mtp.ada_match_rat))
    k3 = int(mtp.three_len * (1 - mtp.ada_match_rat))
    res4 = yield (
        "hws",
        [
            (mtp.five_seq, cons2, k5),
            (mtp.three_rc_seq, cons2, k3),
            (mtp.five_rc_seq, cons2, k5),
            (mtp.three_seq, cons2, k3),
        ],
    )

    def forward():
        nonlocal tar_start, tar_end, full_length, tot_ed
        _5_ed, _5_start, _5_end = res4[0]
        if _5_ed == -1:
            return False
        _3_ed, _3_start, _3_end = res4[1]
        if _3_ed == -1:
            return False
        if _3_start <= _5_end:
            if _3_end + cons_len < cons_len * 2 and _3_start + cons_len > _5_end:
                tar_start = _5_end + 1
                tar_end = _3_start + cons_len - 1
                full_length = 1
                tot_ed = _5_ed + _3_ed
        else:
            tar_start = _5_end + 1
            tar_end = _3_start - 1
            tot_ed = _5_ed + _3_ed
            full_length = 1
        return tot_ed == 0

    def reverse():
        nonlocal tar_start, tar_end, full_length
        _5_ed, _5_start, _5_end = res4[2]
        if _5_ed == -1:
            return
        _3_ed, _3_start, _3_end = res4[3]
        if _3_ed == -1:
            return
        if _5_ed + _3_ed < tot_ed:
            if _5_start <= _3_end:
                if (
                    _5_end + cons_len < cons_len * 2
                    and _5_start + cons_len > _3_end
                ):
                    tar_start = _3_end + 1
                    tar_end = _5_start + cons_len - 1
                    full_length = 2
            else:
                tar_start = _3_end + 1
                tar_end = _5_start - 1
                full_length = 2

    if not forward():
        reverse()

    if tar_start > 0 and tar_end > tar_start:
        seq = cons2[tar_start : tar_end + 1]
        qual = qual2[tar_start : tar_end + 1] if qual2 is not None else None
        return seq, qual, full_length
    return cons_seq, cons_qual, full_length


# --- single-copy full-length (gen_cons.c:89-171) ---


def _collect_ed_res(mtp: Params, q: str, seq: str):
    """Up to 3 adapter placements on the raw read (gen_cons.c:89-110)."""
    res = []
    qlen = len(q)
    k = int(qlen * (1 - mtp.ada_match_rat))
    ed, start, end = align_hw(q, seq, k)
    if ed != -1:
        res.append((ed, start, end))
        if start >= qlen:
            ed2, s2, e2 = align_hw(q, seq[:start], k)
            if ed2 != -1:
                res.append((ed2, s2, e2))
        if end <= len(seq) - qlen:
            ed3, s3, e3 = align_hw(q, seq[end:], k)
            if ed3 != -1:
                res.append((ed3, end + s3, end + e3))
    return res


def _get_full_len_seq(mtp: Params, left_res, right_res):
    """Best (5', 3'rc) pair with gap >= min_len (gen_cons.c:112-126)."""
    INT32_MAX = 2**31 - 1
    tot_ed = INT32_MAX
    tar = None
    for led, lstart, lend in left_res:
        for red, rstart, rend in right_res:
            if rstart - lend - 1 >= mtp.min_len:
                if tot_ed > led + red:
                    tot_ed = led + red
                    tar = (lend + 1, rstart - 1)
    return tot_ed, tar


def single_copy_full_len_seq(
    seq: str, result: TandemResult, mtp: Params
) -> None:
    """Synchronous wrapper around single_copy_full_len_gen (host path)."""
    gen = single_copy_full_len_gen(seq, result, mtp)
    try:
        req = gen.send(None)
        while True:
            req = gen.send(resolve_oracle(req, mtp))
    except StopIteration:
        pass


def single_copy_full_len_gen(seq: str, result: TandemResult, mtp: Params):
    """Single-copy full-length extraction (gen_cons.c:128-171) as a
    generator: the four adapters' first placements batch as one 'hws'
    round, the conditional prefix/suffix re-searches
    (_collect_ed_res's up-to-3 placements, gen_cons.c:89-110) as a
    second — so an adapter-heavy -s -F run resolves two device rounds
    per chunk instead of up to twelve host searches per read.  The
    reverse-orientation searches run speculatively (result-identical;
    the reference gates them on tot_ed > 0).  Note: the consensus here
    is the RAW read slice (case preserved), qual = '!'."""
    INT32_MAX = 2**31 - 1
    full_length = 0
    par = None
    qs = [mtp.five_seq, mtp.three_rc_seq, mtp.five_rc_seq, mtp.three_seq]
    ks = [int(len(q) * (1 - mtp.ada_match_rat)) for q in qs]
    r1 = yield ("hws", [(q, seq, k) for q, k in zip(qs, ks)])
    reqs2 = []
    meta = []
    for ai, (q, k, first) in enumerate(zip(qs, ks, r1)):
        ed, start, end = first
        if ed == -1:
            continue
        if start >= len(q):
            meta.append((ai, "pre", None, len(reqs2)))
            reqs2.append((q, seq[:start], k))
        if end <= len(seq) - len(q):
            meta.append((ai, "suf", end, len(reqs2)))
            reqs2.append((q, seq[end:], k))
    r2 = (yield ("hws", reqs2)) if reqs2 else []
    res = [[], [], [], []]
    for ai, (q, k, first) in enumerate(zip(qs, ks, r1)):
        ed, start, end = first
        if ed == -1:
            continue
        res[ai].append(first)
        for mai, kind_, off, ri2 in meta:
            if mai != ai:
                continue
            ed2, s2, e2 = r2[ri2]
            if ed2 == -1:
                continue
            if kind_ == "pre":
                res[ai].append((ed2, s2, e2))
            else:
                res[ai].append((ed2, off + s2, off + e2))
    _5, _3, _5r, _3r = res
    tot_ed, tar = _get_full_len_seq(mtp, _5, _3)
    if tot_ed != INT32_MAX:
        par = tar
        full_length = 1
    if tot_ed > 0:
        tot2, tar2 = _get_full_len_seq(mtp, _3r, _5r)
        if tot2 < tot_ed:
            par = tar2
            full_length = 2
    if full_length > 0 and par is not None:
        tar_start, tar_end = par
        cons_len = tar_end - tar_start + 1
        if mtp.only_unit:
            result.add_unit([tar_start, tar_end])
        else:
            qual = None
            if mtp.out_fmt in (FASTQ_FMT, TAB_QUAL_FMT):
                qual = "!" * cons_len
            rec = ConsRecord(
                seq=seq[tar_start : tar_start + cons_len],
                qual=qual,
                start=tar_start,
                end=tar_end,
                copy_num=1.0,
                ave_match=100.0,
                full_length=full_length,
                sub_pos=[tar_start, tar_end],
            )
            result.add_cons(rec, mtp)
