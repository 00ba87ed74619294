"""Native-backed seeding: same results as ops/seeding.py, C speed.

Covers the default w=1 direct-hash path (with or without HPC); minimizer
seeding (w>1) and environments without a C compiler fall back to the
NumPy oracle. Parity is pinned by tests/test_seeding.py.
"""

from __future__ import annotations

import ctypes
from typing import Tuple

import numpy as np

from ..native import get_lib
from .seeding import collect_tandem_repeat_hits as _np_collect


def collect_tandem_repeat_hits(
    bseq: np.ndarray, k: int, w: int, use_hpc: bool, min_p: int, max_p: int
) -> Tuple[np.ndarray, np.ndarray]:
    """collect_tandem_repeat_hit (reference src/tandem_hit.c:227-237)."""
    lib = get_lib()
    if lib is None or w != 1 or k > 16:
        return _np_collect(bseq, k, w, use_hpc, min_p, max_p)
    b = np.ascontiguousarray(bseq, dtype=np.uint8)
    L = len(b)
    if L < k:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    ends = np.empty(L, np.int64)
    periods = np.empty(L, np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    n = lib.th_seed(
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(L),
        ctypes.c_int64(k),
        ctypes.c_int(1 if use_hpc else 0),
        ctypes.c_int64(min_p),
        ctypes.c_int64(max_p),
        ends.ctypes.data_as(i64p),
        periods.ctypes.data_as(i64p),
    )
    return ends[:n], periods[:n]
