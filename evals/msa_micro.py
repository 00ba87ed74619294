"""DeviceMSA step-level microbenchmark on the real chip.

Reproduces the headline bench's MSA workload (512 regions of 9 x 450bp
units at 10% error -> bucket T=640, band W=128) and times each device
step separately, so the dominant term inside the dev_msa stage timer is
attributable: scores / DP / backtrack / update / gather / pull.

Usage: python evals/msa_micro.py [n_regions]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from bench import synth_read  # noqa: E402


def make_regions(n, unit_len=450, copies=9, err=0.10, seed=42):
    from tidehunter_tpu.io.codec import encode

    rng = np.random.default_rng(seed)
    regions = []
    for _ in range(n):
        unit = rng.integers(0, 4, unit_len).astype(np.uint8)
        units = []
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
            units.append(np.array(out, dtype=np.uint8))
        regions.append(units)
    return regions


def bench_fn(fn, *args, reps=5, warm=2):
    import jax

    for _ in range(warm):
        r = fn(*args)
        jax.block_until_ready(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts), r


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    import jax
    import jax.numpy as jnp

    from tidehunter_tpu.ops.msa_device import DeviceMSA, band_ladder
    from tidehunter_tpu.params import Params

    m = Params()
    msa = DeviceMSA(m.match, m.mismatch, m.gap_open1, m.gap_ext1,
                    gap_open2=m.gap_open2, gap_ext2=m.gap_ext2)
    regions = make_regions(n)

    # end-to-end consensus_batch
    t0 = time.perf_counter()
    msa.consensus_batch(regions)
    warm = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        msa.consensus_batch(regions)
        ts.append(time.perf_counter() - t0)
    print(f"consensus_batch({n}): warm={warm:.2f}s steady={min(ts):.3f}s "
          f"({min(ts) / n * 1e3:.2f} ms/region)")

    # replicate the internal shapes for the bench workload
    cap = max(max(len(u) for u in units) for units in regions)
    spread = max(
        max(len(u) for u in units) - min(len(u) for u in units)
        for units in regions)
    need = int(cap * 1.2) + 8
    T = msa._bucket(need)
    W = band_ladder(T, spread)[0]
    print(f"cap={cap} spread={spread} need={need} -> T={T} W={W}")
    round_fn, polish_round_fn, B, LQplus, NL = msa._round(T, W)
    run_dp, Bd, _ = msa._dp_run(T, W)
    run_bt, _, _ = msa._bt_run(T, W)
    print(f"B={B} LQplus={LQplus} NL={NL}")

    R = min(n, B)
    U = max(len(u) for u in regions)
    units_arr = np.full((B, U, T), 4, np.uint8)
    ulen = np.zeros((B, U), np.int32)
    nunits = np.ones(B, np.int32)
    for i in range(R):
        units = regions[i]
        nunits[i] = len(units)
        for k, u in enumerate(units):
            L = min(len(u), T)
            units_arr[i, k, :L] = u[:L]
            ulen[i, k] = max(1, L)
    units_dev = jnp.asarray(units_arr)
    ulen_dev = jnp.asarray(ulen)
    nunits_dev = jnp.asarray(nunits)
    counts, ncol = msa.init_step(units_dev, ulen_dev)
    n_placed = jnp.ones(B, jnp.int32)
    overflow = jnp.zeros(B, bool)
    ev = jnp.zeros(B, jnp.int32)
    k = jnp.asarray(3)

    dt, (unit_k, qlen_k, active) = bench_fn(
        msa.gather_step, units_dev, ulen_dev, nunits_dev, k)
    print(f"gather_step: {dt * 1e3:.2f} ms")

    def scores(counts, n_placed, ncol, unit_k):
        return msa.scores_step(counts, n_placed, ncol, unit_k,
                               lqplus=LQplus)

    dt, (sub, wdel, wl, wdel2, wl2, qbuf) = bench_fn(
        scores, counts, n_placed, ncol, unit_k)
    print(f"scores_step: {dt * 1e3:.2f} ms")

    maxr = jnp.max(qlen_k + ncol).reshape(1, 1)
    dt, dirs = bench_fn(run_dp, maxr, qbuf, sub, wl, wdel, wl2, wdel2,
                        qlen_k.reshape(-1, 1), ncol.reshape(-1, 1))
    cells = float(B) * T * (W or T)
    print(f"dp kernel: {dt * 1e3:.2f} ms ({cells / dt / 1e9:.2f} Gcell/s "
          f"dispatched)")

    dt, (ops_c, nst, tchk) = bench_fn(run_bt, dirs, qlen_k.reshape(-1, 1),
                                      ncol.reshape(-1, 1))
    print(f"bt kernel: {dt * 1e3:.2f} ms")

    dt, _ = bench_fn(msa.update_step, counts, n_placed, ncol, overflow,
                     unit_k, qlen_k, active, ops_c, nst)
    print(f"update_step: {dt * 1e3:.2f} ms")

    dt, st = bench_fn(round_fn, counts, n_placed, ncol, overflow, ev,
                      unit_k, qlen_k, active)
    print(f"fused round_fn: {dt * 1e3:.2f} ms")

    dt, packed = bench_fn(msa.consensus_step, counts, n_placed, ncol,
                          overflow, ev)
    print(f"consensus_step: {dt * 1e3:.2f} ms")

    t0 = time.perf_counter()
    np.asarray(packed)
    print(f"pull: {(time.perf_counter() - t0) * 1e3:.2f} ms")

    # dispatch-side cost: enqueue 8 dependent rounds then block once
    st = (counts, n_placed, ncol, overflow, ev)
    for _ in range(2):
        s2 = st
        for _ in range(8):
            s2 = round_fn(*s2, unit_k, qlen_k, active)
        jax.block_until_ready(s2)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        s2 = st
        enq = []
        for _ in range(8):
            s2 = round_fn(*s2, unit_k, qlen_k, active)
            enq.append(time.perf_counter() - t0)
        jax.block_until_ready(s2)
        ts.append(time.perf_counter() - t0)
    print(f"8 chained rounds: {min(ts) * 1e3:.2f} ms total; enqueue "
          f"timeline {' '.join(f'{e * 1e3:.0f}' for e in enq)} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
