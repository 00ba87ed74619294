"""Round-5 fused offload micro: end-to-end device seed+chain per chunk.

Times ops/offload.device_seed_chain (the production fused path) against
the host seed+chain baseline on the bench workload, with a stage split
(pack / dispatch+device / pull / host post) for attribution.

Usage: python evals/offload_micro.py [n_reads] [window]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    window = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    import jax

    from bench import synth_read
    from tidehunter_tpu.io.codec import encode
    from tidehunter_tpu.ops import offload
    from tidehunter_tpu.ops.seeding_native import collect_tandem_repeat_hits
    from tidehunter_tpu.ops.chaining_native import tandem_chain_native
    from tidehunter_tpu.params import Params
    from tidehunter_tpu.utils.metrics import METRICS

    mtp = Params()
    rng = np.random.default_rng(42)
    seqs = [synth_read(rng) for _ in range(n)]
    bseqs = [encode(s) for s in seqs]
    print(f"# platform={jax.devices()[0].platform} n={n} window={window}")

    # host baseline
    def host_path():
        out = []
        for b in bseqs:
            e, p = collect_tandem_repeat_hits(
                b, mtp.k, mtp.w, mtp.hpc, mtp.min_p, mtp.max_p)
            out.append(tandem_chain_native(e, p, mtp.k))
        return out

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        host_chains = host_path()
        best = min(best, time.perf_counter() - t0)
    print(f"host seed+chain      {best*1e3:9.1f} ms  "
          f"({best/n*1e3:6.3f} ms/read)")

    # fused device path
    def dev_path():
        return offload.device_seed_chain(bseqs, mtp, window=window)

    dev_path()  # compile
    best = float("inf")
    for _ in range(3):
        METRICS.reset()
        t0 = time.perf_counter()
        hits, chains = dev_path()
        dt = time.perf_counter() - t0
        if dt < best:
            best = dt
            snap = METRICS.snapshot()
    print(f"device fused         {best*1e3:9.1f} ms  "
          f"({best/n*1e3:6.3f} ms/read)")
    print(f"#   counters: {snap}")

    # chains must agree with the host path
    mismatch = 0
    for (hdp, hch), (gdp, gch) in zip(host_chains, [c for c in chains]):
        if len(hch) != len(gch):
            mismatch += 1
            continue
        for a, b in zip(hch, gch):
            if not np.array_equal(a.cells, b.cells):
                mismatch += 1
                break
    print(f"# chain mismatches vs host: {mismatch}/{n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
