"""Structured metrics (SURVEY §5.5): the observability the reference lacks.

Process-global counters and stage timers, cheap enough to stay on in
production. Tracked by the engine: per-stage wall time, device request
items vs padded rows (padding waste), kernel dispatch and pull counts;
by the runner: reads, consensus records, reads/s.

Snapshot at end of run via `snapshot()`; the CLI logs a summary line and
`--metrics FILE` (or TH_METRICS=FILE) dumps the full JSON.
"""

from __future__ import annotations

import contextlib
import threading
import time
from typing import Dict


class Metrics:
    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.counters: Dict[str, float] = {}
        self.timers: Dict[str, float] = {}

    def add(self, name: str, value: float = 1.0) -> None:
        with self._lock:
            self.counters[name] = self.counters.get(name, 0) + value

    @contextlib.contextmanager
    def timed(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self.timers[name] = self.timers.get(name, 0.0) + dt

    def reset(self) -> None:
        with self._lock:
            self.counters.clear()
            self.timers.clear()

    def snapshot(self) -> Dict[str, float]:
        with self._lock:
            out: Dict[str, float] = {}
            for k, v in self.counters.items():
                out[k] = v
            for k, v in self.timers.items():
                out[f"time_{k}_s"] = round(v, 4)
        rows = out.get("device_rows", 0)
        items = out.get("device_items", 0)
        if rows:
            # fraction of dispatched rows that were padding
            out["padding_waste"] = round(1.0 - items / rows, 4)
        return out

    def summary_line(self) -> str:
        s = self.snapshot()
        parts = []
        for k in sorted(s):
            v = s[k]
            parts.append(f"{k}={v:g}")
        return " ".join(parts)


METRICS = Metrics()
