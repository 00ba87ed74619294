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


def probe_device(timeout_s: int = 420) -> str:
    """Fail-fast device probe. When the axon tunnel is dead, jax.devices()
    HANGS (observed: every probe in /tmp/tpu_probe2.log burned its full
    300 s timeout) — without this guard a bench run on a dead tunnel
    stalls through the smoke timeout and then hangs forever in the
    engine. Probes in a subprocess so a hang can be killed and the
    parent process stays JAX-uninitialized for tpu_smoke."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax\n"
             "try:\n"
             "    print(jax.devices()[0].platform)\n"
             "except Exception:\n"
             "    jax.config.update('jax_platforms', 'cpu')\n"
             "    print(jax.devices()[0].platform)\n"],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return ""
    return (r.stdout or "").strip() if r.returncode == 0 else ""


def tpu_smoke() -> str:
    """Run the hardware-gated parity subset (banded-MSA parity, wavefront
    lowering, ksw2 device) on the real chip BEFORE the bench engine grabs
    the device — VERDICT r2 item 7: these tests skip on CPU, so without
    this hook nothing in the round loop would ever execute them.

    Runs as a subprocess so its backend teardown can't pollute the bench
    process; the parent must not have initialized JAX yet (the tunnel is
    single-tenant). Returns a status string for the detail line."""
    if os.environ.get("TH_SKIP_TPU_SMOKE", "") == "1":
        return "skipped(env)"
    import subprocess

    env = dict(os.environ)
    env["TH_TEST_TPU"] = "1"
    try:
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-x", "-rs",
             "tests/test_msa_device.py", "tests/test_wavefront.py",
             "tests/test_ksw2_device.py"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            env=env, capture_output=True, text=True, timeout=2400,
        )
    except subprocess.TimeoutExpired:
        return "TIMEOUT"
    tail = (r.stdout or "").strip().splitlines()
    summary = tail[-1] if tail else ""
    return ("pass: " if r.returncode == 0 else "FAIL: ") + summary


def main() -> int:
    # the measured pipeline overlaps a host prepare thread with the
    # device-drive thread on a 1-core host: the drive thread wakes from
    # ~100 device waits per rep and each wakeup can stall a full GIL
    # switch interval (default 5 ms) behind the prepare thread
    sys.setswitchinterval(0.001)
    n_reads = int(os.environ.get("BENCH_READS", "1024"))
    platform = probe_device()
    print(f"# device probe: {platform or 'UNREACHABLE'}", file=sys.stderr)
    if not platform:
        # Honest failure beats a silent stall: report zero so the round
        # records "hardware was unreachable", not a hung process.
        print(
            json.dumps(
                {
                    "metric": "reads/s/chip, synthetic ONT R2C2 4.3kb (450bp x9, 10% err), full pipeline",
                    "value": 0.0,
                    "unit": "reads/s",
                    "vs_baseline": 0.0,
                    "vs_t32": 0.0,
                    "error": "device unreachable (jax.devices() hung >420s); see evals/hw_r03 for the staged hardware round",
                }
            )
        )
        return 0
    if platform == "cpu":
        # The probe only resolves to CPU when the axon plugin isn't
        # registered (no tunnel env) — adopt it so a CPU-forced bench run
        # works instead of crashing on the sitecustomize 'axon' pin.
        import jax

        jax.config.update("jax_platforms", "cpu")
        os.environ.setdefault("TH_SKIP_TPU_SMOKE", "1")
    smoke = tpu_smoke()
    print(f"# tpu_smoke: {smoke}", file=sys.stderr)

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
    # overlaps chunk N's device rounds), streaming IO + serialization.
    # BENCH_CHUNK overrides for chunk-size sweeps.
    mtp.chunk_read_n = int(
        os.environ.get("BENCH_CHUNK", "0")
    ) or max(64, n_reads // 2)
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

    # Steady-state attribution: drop everything the warmup accumulated
    # (minutes of Mosaic compiles) so the stage/Gcell lines below describe
    # ONLY the measured reps (VERDICT r3 weak #2: warmup-polluted timers
    # made the round-3 attribution unusable).
    from tidehunter_tpu.utils.metrics import METRICS

    METRICS.reset()

    # Best of BENCH_REPS measured passes: the tunnel's epoch-to-epoch
    # drift exceeded its ±10% run-to-run variance in round 2 (RESULTS.md),
    # and interference can only slow a pass down — max is the honest
    # steady-state estimator. Per-rep times go to the detail line, and the
    # median rides along in the JSON so round-over-round deltas aren't
    # variance-sensitive (ADVICE r4).
    reps = max(1, int(os.environ.get("BENCH_REPS", "3")))
    rep_dts = []
    rep_snaps = []
    metrics = None
    prev = METRICS.snapshot()
    for _ in range(reps):
        sink = io.StringIO()
        t0 = time.perf_counter()
        metrics = runner.run(fa.name, mtp, out=sink, process_chunk=engine)
        rep_dts.append(time.perf_counter() - t0)
        cur = METRICS.snapshot()
        rep_snaps.append(
            {k: cur.get(k, 0.0) - prev.get(k, 0.0)
             for k in cur if k.startswith("time_")}
        )
        prev = cur
    dt = min(rep_dts)
    reads_per_s = n_reads / dt
    median_rps = n_reads / sorted(rep_dts)[len(rep_dts) // 2]
    os.unlink(fa.name)

    # Measured CPU reference baseline (BASELINE.md, round 2): the reference's
    # own C stages compiled from /root/reference (abPOA DP stubbed — an upper
    # bound on reference speed) run this identical 1024-read workload at
    # 285.1 reads/s on one host core; ×32 linear extrapolation = 9,124.
    base_reads_per_s = 285.1
    base_reads_per_s_32t = 32 * base_reads_per_s

    n_cons = metrics.cons_records
    print(
        f"# reps: {' '.join(f'{n_reads / d:.1f}' for d in rep_dts)} reads/s",
        file=sys.stderr,
    )
    print(
        f"# detail: {n_reads} reads in {dt:.2f}s; {n_cons} consensus records; "
        f"C-reference baseline {base_reads_per_s:.1f} reads/s (1 thread, POA "
        f"excluded), x{reads_per_s / base_reads_per_s_32t:.3f} of 32-thread "
        f"linear extrapolation",
        file=sys.stderr,
    )
    # Per-stage attribution (VERDICT r2: every perf claim must be
    # attributable): host-wall stage timers, device-blocked timers, DP cell
    # throughput — steady-state only (METRICS reset after warmup), plus a
    # per-rep stage table so compile/steady drift is visible.
    s = METRICS.snapshot()
    stage_keys = [k for k in sorted(s) if k.startswith("time_")]
    if stage_keys:
        print(
            "# stages (steady, all reps): " + " ".join(
                f"{k[5:-2]}={s[k]:.2f}s" for k in stage_keys),
            file=sys.stderr,
        )
        for i, snap in enumerate(rep_snaps):
            line = " ".join(
                f"{k[5:-2]}={snap.get(k, 0.0):.2f}s" for k in stage_keys)
            print(f"# rep{i}: {line}", file=sys.stderr)
    wf_t = s.get("time_dev_global_s", 0) + s.get("time_dev_ext_s", 0)
    msa_t = s.get("time_dev_msa_s", 0)
    lines = []
    if wf_t and s.get("wf_cells"):
        lines.append(
            f"wavefront {s['wf_cells'] / wf_t / 1e9:.2f} Gcell/s useful"
            f" ({s.get('wf_cells_disp', 0) / wf_t / 1e9:.2f} dispatched)")
    if msa_t and s.get("msa_cells"):
        lines.append(f"msa {s['msa_cells'] / msa_t / 1e9:.2f} Gcell/s")
    if s.get("rounds"):
        lines.append(f"rounds={s['rounds']:g}")
    if lines:
        print("# kernels: " + "; ".join(lines), file=sys.stderr)

    # Second tracked axis (VERDICT r4 missing #3): real ONT reads
    # (reference test.fq, 100 reads, periods 0.1-3.1 kb) through the same
    # warmup + best-of-reps harness.  Reference C stages on this workload:
    # 173.6 reads/s at 1 thread (BASELINE.md).  TH_SKIP_TESTFQ=1 skips.
    testfq_rps = None
    testfq = "/root/reference/test.fq"
    if os.environ.get("TH_SKIP_TESTFQ", "") != "1" and os.path.exists(testfq):
        mtp_fq = Params()
        # one 100-read chunk: at 50 reads/chunk the per-chunk device
        # round trips (~25-50 ms each, ~12 rounds) were ~35% of wall
        mtp_fq.chunk_read_n = 100
        runner.run(testfq, mtp_fq, out=io.StringIO(), process_chunk=engine)
        fq_dts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            runner.run(testfq, mtp_fq, out=io.StringIO(),
                       process_chunk=engine)
            fq_dts.append(time.perf_counter() - t0)
        testfq_rps = 100 / min(fq_dts)
        print(
            f"# test.fq reps: {' '.join(f'{100 / d:.1f}' for d in fq_dts)} "
            f"reads/s (C reference 1-thread: 173.6)",
            file=sys.stderr,
        )

    out = {
        "metric": "reads/s/chip, synthetic ONT R2C2 4.3kb (450bp x9, 10% err), full pipeline",
        "value": round(reads_per_s, 3),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / base_reads_per_s, 2),
        "vs_t32": round(reads_per_s / base_reads_per_s_32t, 4),
        "median": round(median_rps, 3),
    }
    if testfq_rps is not None:
        out["testfq_reads_per_s"] = round(testfq_rps, 3)
        out["testfq_vs_t1"] = round(testfq_rps / 173.6, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
