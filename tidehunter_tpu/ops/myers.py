"""Edit-distance infix search: edlib-equivalent Myers bit-parallel DP.

Reimplements the subset of edlib the reference actually uses
(reference src/edlib_align.c:73-85): HW (infix) mode with TASK_LOC —
edit distance, end location, start location, with a k cap.

Parity-critical semantics (reference edlib/src/edlib.cpp:141-250):
  * best end = the LEFTMOST target position achieving the minimum edit
    distance (wrapper takes endLocations[0], src/edlib_align.c:79-81)
  * start for that end = LEFTMOST start achieving the same distance: edlib
    runs SHW on reversed sequences and takes the LAST position
    (edlib.cpp:227-234, "alignment will not start with insertions")
  * matching is case-insensitive via explicit equality pairs
    (src/edlib_align.c:21-27) — equivalent to uppercasing both sides
  * k < 0 means unlimited (edlib auto-doubles k until a solution is found)

The oracle uses Python arbitrary-precision ints as bit vectors (query
length = number of bits), looping once over the target — Myers 1999 without
the block decomposition. Adapter searches are short (adapter ~20-60 bp vs a
~1-2 kb doubled consensus) and run only on records that survive every other
filter, so the host oracle is the production path; batch it on device only
if -F workloads ever dominate a profile.
"""

from __future__ import annotations

from typing import Optional, Tuple


def _peq(query: str) -> dict:
    peq: dict = {}
    for i, c in enumerate(query):
        peq[c] = peq.get(c, 0) | (1 << i)
    return peq


def _scan_scores(query: str, target: str, top_boundary_one: bool) -> list:
    """Myers bit-parallel scan; returns score[j] = D[m][j+1] for each target
    column. top_boundary_one=False -> HW (top row 0); True -> SHW/NW style
    (top row = j)."""
    m = len(query)
    peq = _peq(query)
    hbit = 1 << (m - 1)
    mask = (1 << m) - 1
    pv, mv, score = mask, 0, m
    out = []
    for c in target:
        eq = peq.get(c, 0)
        xv = eq | mv
        xh = (((eq & pv) + pv) ^ pv) | eq
        ph = mv | (~(xh | pv) & mask)
        mh = pv & xh
        if ph & hbit:
            score += 1
        elif mh & hbit:
            score -= 1
        ph = (ph << 1) & mask | (1 if top_boundary_one else 0)
        mh = (mh << 1) & mask
        pv = (mh | (~(xv | ph) & mask)) & mask
        mv = ph & xv
        out.append(score)
    return out


def align_hw(
    query: str, target: str, k: int = -1
) -> Tuple[int, Optional[int], Optional[int]]:
    """Infix search of query in target.

    Returns (ed, start, end) with 0-based inclusive target coordinates, or
    (-1, None, None) if the best distance exceeds k (k >= 0 caps it;
    k < 0 = unlimited).
    """
    if len(query) == 0:
        return (0, 0, -1) if k < 0 or k >= 0 else (-1, None, None)
    q = query.upper()
    t = target.upper()
    if len(t) == 0:
        return -1, None, None
    scores = _scan_scores(q, t, top_boundary_one=False)
    best = min(scores)
    if k >= 0 and best > k:
        return -1, None, None
    end = scores.index(best)  # leftmost best end
    # start: SHW of reversed query vs reversed target prefix [0..end];
    # last (largest) position with score == best -> leftmost start.
    rshw = _scan_scores(q[::-1], t[end::-1], top_boundary_one=True)
    pos = max(j for j, s in enumerate(rshw) if s == best)
    return best, end - pos, end


def edit_distance_nw(query: str, target: str, k: int = -1) -> int:
    """Global (NW) edit distance; -1 if it exceeds k (k >= 0)."""
    if len(query) == 0:
        return len(target) if k < 0 or len(target) <= k else -1
    if len(target) == 0:
        return len(query) if k < 0 or len(query) <= k else -1
    scores = _scan_scores(query.upper(), target.upper(), top_boundary_one=True)
    ed = scores[-1]
    if k >= 0 and ed > k:
        return -1
    return ed
