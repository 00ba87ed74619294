"""Native host kernels (C, loaded via ctypes).

The TPU owns the batched compute path; irregular host control flow that the
reference ran in C (the chaining DP with data-dependent early exits,
reference src/tandem_chain.c) stays native here too. The shared library is
built on demand from the vendored source with the system compiler and
cached next to it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_DIR, "chainx.c"), os.path.join(_DIR, "seedx.c"),
         os.path.join(_DIR, "alignx.c"), os.path.join(_DIR, "poax.c")]
_LIB = os.path.join(_DIR, "libchainx.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cc = os.environ.get("CC", "cc")
    # -O3 -march=native: integer-only hot loops (chain DP, seeding hash,
    # inline ksw2 walk) — bit-exactness is unaffected and re-verified by
    # the golden tests; falls back to -O2 if the host rejects the flags.
    cmd = [cc, "-O3", "-march=native", "-shared", "-fPIC", "-o",
           _LIB] + _SRCS
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except subprocess.CalledProcessError:
        pass
    except FileNotFoundError as exc:
        print(f"[native] build failed: {exc}", file=sys.stderr)
        return False
    cmd = [cc, "-O2", "-shared", "-fPIC", "-o", _LIB] + _SRCS
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as exc:
        print(f"[native] build failed: {exc}", file=sys.stderr)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or any(
        os.path.getmtime(_LIB) < os.path.getmtime(src) for src in _SRCS
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError as exc:
        print(f"[native] load failed: {exc}", file=sys.stderr)
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.th_chain.restype = ctypes.c_int64
    lib.th_chain.argtypes = [i64p, i64p, ctypes.c_int64, ctypes.c_int64,
                             i64p, i64p, i64p]
    lib.th_chain_post.restype = ctypes.c_int64
    lib.th_chain_post.argtypes = [i64p, i64p, i64p, i64p, ctypes.c_int64,
                                  i64p, i64p, i64p]
    lib.th_seed.restype = ctypes.c_int64
    lib.th_seed.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64,
                            ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
                            i64p, i64p]
    lib.th_global_tleft_batch.restype = None
    lib.th_global_tleft_batch.argtypes = [u8p, i64p, i64p, u8p, i64p, i64p,
                                          i64p, ctypes.c_int64, i64p, i64p]
    lib.th_global_tleft.restype = ctypes.c_int64
    lib.th_global_tleft.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_int64]
    lib.th_walk_right.restype = ctypes.c_int64
    lib.th_walk_right.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_int64, ctypes.c_int64,
                                  ctypes.c_int64, ctypes.c_int64,
                                  ctypes.c_double, ctypes.c_int64,
                                  ctypes.c_void_p, ctypes.c_int64]
    lib.th_poa_msa.restype = ctypes.c_int64
    lib.th_poa_msa.argtypes = [u8p, i64p, ctypes.c_int64,
                               ctypes.c_int64, ctypes.c_int64,
                               ctypes.c_int64, ctypes.c_int64,
                               ctypes.c_int64, ctypes.c_int64,
                               u8p, i64p, ctypes.c_int64]
    _lib = lib
    return _lib
