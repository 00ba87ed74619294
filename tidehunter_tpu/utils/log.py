"""Timestamped stderr logging (equivalent of the reference's
err_func_format_printf, reference src/utils.c:393-404) plus simple
wall/CPU/RSS reporting (src/main.c:531)."""

from __future__ import annotations

import resource
import sys
import time

_T0 = time.time()
_CPU0 = time.process_time()


def log(msg: str, func: str = "") -> None:
    ts = time.strftime("%a %b %d %H:%M:%S %Y")
    tag = f"[{func}] " if func else ""
    print(f"[{ts}] {tag}{msg}", file=sys.stderr)


def resource_line() -> str:
    """'Real time / CPU / Peak RSS' exit line (main.c:531)."""
    real = time.time() - _T0
    cpu = time.process_time() - _CPU0
    rss_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    return (
        f"Real time: {real:.3f} sec; CPU: {cpu:.3f} sec; "
        f"Peak RSS: {rss_kb / 1024.0 / 1024.0:.3f} GB"
    )
