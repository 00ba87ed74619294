"""End-of-round benchmark: full-pipeline reads/s on one chip.

Workload: synthetic ONT-R2C2-style concatemer reads (~4.3 kb: 9 copies of a
450 bp unit at 10% error between adapter-less flanks), the shape of the
reference's headline use case (README.md:62-70; BASELINE.json configs).

Baseline: the reference's own C stages (seeding/chaining/partition/ksw2/
edlib, abPOA DP stubbed) compiled from /root/reference and timed on this
host at 285.1 reads/s single-thread on this exact workload — see
BASELINE.md "Measured CPU baseline". vs_baseline = ours / 285.1; the
32-thread linear extrapolation (9,124 reads/s) is printed in the detail
line.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time

import numpy as np


def synth_read(rng, unit_len=450, copies=9, err=0.10, flank=150):
    from tidehunter_tpu.io.codec import decode

    unit = rng.integers(0, 4, unit_len).astype(np.uint8)
    parts = [rng.integers(0, 4, flank).astype(np.uint8)]
    for _ in range(copies):
        out = []
        for c in unit:
            r = rng.random()
            if r < err / 3:
                continue
            elif r < 2 * err / 3:
                out.append(rng.integers(0, 4))
                out.append(c)
            elif r < err:
                out.append(rng.integers(0, 4))
            else:
                out.append(c)
        parts.append(np.array(out, dtype=np.uint8))
    parts.append(rng.integers(0, 4, flank).astype(np.uint8))
    return decode(np.concatenate(parts))


def main() -> int:
    n_reads = int(os.environ.get("BENCH_READS", "1024"))

    import tempfile

    from tidehunter_tpu.io.fastx import FastxRecord
    from tidehunter_tpu.params import Params
    from tidehunter_tpu.engine import make_engine
    from tidehunter_tpu.pipeline import runner

    rng = np.random.default_rng(42)
    reads = [
        FastxRecord(name=f"r2c2_{i}", comment="", seq=synth_read(rng))
        for i in range(n_reads)
    ]

    mtp = Params()
    # production path: pipelined runner (chunk N+1's host seed/chain
    # overlaps chunk N's device rounds), streaming IO + serialization
    mtp.chunk_read_n = max(64, n_reads // 2)
    engine = make_engine(mtp, platform="tpu")

    fa = tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False)
    for rec in reads:
        fa.write(f">{rec.name}\n{rec.seq}\n")
    fa.close()

    # warmup: pays all kernel compiles AND warms the device RPC path — the
    # axon tunnel's first ~10 dispatch rounds carry connection-setup
    # latency. A full warmup run covers every batch shape the measured run
    # will dispatch (this platform recompiles per shape), so the
    # measurement reflects steady-state throughput.
    runner.run(fa.name, mtp, out=io.StringIO(), process_chunk=engine)

    sink = io.StringIO()
    t0 = time.perf_counter()
    metrics = runner.run(fa.name, mtp, out=sink, process_chunk=engine)
    dt = time.perf_counter() - t0
    reads_per_s = n_reads / dt
    os.unlink(fa.name)

    # Measured CPU reference baseline (BASELINE.md, round 2): the reference's
    # own C stages compiled from /root/reference (abPOA DP stubbed — an upper
    # bound on reference speed) run this identical 1024-read workload at
    # 285.1 reads/s on one host core; ×32 linear extrapolation = 9,124.
    base_reads_per_s = 285.1
    base_reads_per_s_32t = 32 * base_reads_per_s

    n_cons = metrics.cons_records
    print(
        f"# detail: {n_reads} reads in {dt:.2f}s; {n_cons} consensus records; "
        f"C-reference baseline {base_reads_per_s:.1f} reads/s (1 thread, POA "
        f"excluded), x{reads_per_s / base_reads_per_s_32t:.3f} of 32-thread "
        f"linear extrapolation",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "reads/s/chip, synthetic ONT R2C2 4.3kb (450bp x9, 10% err), full pipeline",
                "value": round(reads_per_s, 3),
                "unit": "reads/s",
                "vs_baseline": round(reads_per_s / base_reads_per_s, 2),
                "vs_t32": round(reads_per_s / base_reads_per_s_32t, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
