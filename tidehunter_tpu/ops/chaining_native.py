"""Native-backed chaining: same results as ops/chaining.py, C speed.

Falls back to the Python oracle when the native library can't be built.

The returned grid is a lightweight view (start/end arrays only): the
downstream partition walk reads nothing else, and building the full
DpGrid (group cumsums, score/from arrays) per read cost more Python time
than the whole native DP.
"""

from __future__ import annotations

import ctypes
from typing import List, Optional, Tuple

import numpy as np

from ..native import get_lib
from .chaining import TOP_N, Chain, tandem_chain as _py_tandem_chain


class DpView:
    """start/end of every hit cell — the only DpGrid fields the partition
    walk (ops/partition.py) and the debug dump (pipeline/core.py) read."""

    __slots__ = ("start", "end")

    def __init__(self, ends: np.ndarray, periods: np.ndarray) -> None:
        self.end = ends
        self.start = ends - periods


def tandem_chain_from_dp(
    ends: np.ndarray,
    periods: np.ndarray,
    score: np.ndarray,
    from_idx: np.ndarray,
    k: int,
) -> Tuple[Optional[object], List[Chain]]:
    """Backtrack/top-chain selection over a DP computed elsewhere (the
    device kernel, ops/chaining_jax.py). Same post-processing as
    tandem_chain_native; only the O(H*W) score scan moved off-host."""
    lib = get_lib()
    if lib is None:
        # no native library: recompute everything with the Python oracle
        # (bit-identical to the device DP by construction)
        return _py_tandem_chain(ends, periods, k)
    n = len(ends)
    if n < 2:
        return None, []
    ends64 = np.ascontiguousarray(ends, dtype=np.int64)
    per64 = np.ascontiguousarray(periods, dtype=np.int64)
    sc64 = np.ascontiguousarray(score, dtype=np.int64)
    fr64 = np.ascontiguousarray(from_idx, dtype=np.int64)
    out_cells = np.empty(n, dtype=np.int64)
    out_offsets = np.empty(TOP_N + 1, dtype=np.int64)
    out_est = np.empty(TOP_N * 3, dtype=np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    n_post = lib.th_chain_post(
        ends64.ctypes.data_as(i64p),
        per64.ctypes.data_as(i64p),
        sc64.ctypes.data_as(i64p),
        fr64.ctypes.data_as(i64p),
        ctypes.c_int64(n),
        out_cells.ctypes.data_as(i64p),
        out_offsets.ctypes.data_as(i64p),
        out_est.ctypes.data_as(i64p),
    )
    dp = DpView(ends64, per64)
    chains: List[Chain] = []
    for ci in range(n_post):
        lo, hi = int(out_offsets[ci]), int(out_offsets[ci + 1])
        chains.append(
            Chain(
                cells=out_cells[lo:hi],
                est_period=int(out_est[ci * 3 + 0]),
                est_start=int(out_est[ci * 3 + 1]),
                est_ch_i=int(out_est[ci * 3 + 2]),
            )
        )
    return dp, chains


def tandem_chain_native(
    ends: np.ndarray, periods: np.ndarray, k: int
) -> Tuple[Optional[object], List[Chain]]:
    lib = get_lib()
    if lib is None:
        return _py_tandem_chain(ends, periods, k)
    n = len(ends)
    if n < 2:
        return None, []
    ends64 = np.ascontiguousarray(ends, dtype=np.int64)
    per64 = np.ascontiguousarray(periods, dtype=np.int64)
    out_cells = np.empty(n, dtype=np.int64)
    out_offsets = np.empty(TOP_N + 1, dtype=np.int64)
    out_est = np.empty(TOP_N * 3, dtype=np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    n_post = lib.th_chain(
        ends64.ctypes.data_as(i64p),
        per64.ctypes.data_as(i64p),
        ctypes.c_int64(n),
        ctypes.c_int64(k),
        out_cells.ctypes.data_as(i64p),
        out_offsets.ctypes.data_as(i64p),
        out_est.ctypes.data_as(i64p),
    )
    dp = DpView(ends64, per64)
    chains: List[Chain] = []
    for ci in range(n_post):
        lo, hi = int(out_offsets[ci]), int(out_offsets[ci + 1])
        chains.append(
            Chain(
                cells=out_cells[lo:hi],
                est_period=int(out_est[ci * 3 + 0]),
                est_start=int(out_est[ci * 3 + 1]),
                est_ch_i=int(out_est[ci * 3 + 2]),
            )
        )
    return dp, chains
