#!/bin/bash
# Hardware measurement round: run after the TPU tunnel is confirmed up
# (python -c "import jax; print(jax.devices())" returns an axon device).
# Produces, under evals/hw_r03/:
#   bench.json/.log  headline bench + tpu_smoke + stage/Gcell attribution
#   ab_offload.log   A/B: seed+chain on device vs host (single chip)
#   chunk_sweep.log  chunk-size sensitivity (1024-read workload)
#   testfq.log       real-ONT (test.fq) steady-state timing
#   sweep.log        full 15-config x 1000-read paper accuracy protocol
# Steps are ordered by round-gate priority (the >=1000 reads/s bench gate
# first, the long accuracy sweep last) and each is independently
# resumable; a dead tunnel mid-run leaves the completed logs in place.
# NOTE: the tunnel is single-tenant — stop any probe loop / other JAX
# process before running this.
set -u
cd "$(dirname "$0")/.."
OUT=evals/hw_r04
mkdir -p "$OUT"

# If the CPU insurance sweep (evals/sweep_cpu.sh) is running, stop it by
# its recorded exact pgid — the 1-core host cannot time hardware runs
# while it contends.
if [ -f /tmp/cpu_sweep.pid ]; then
  SWEEP_PID=$(cat /tmp/cpu_sweep.pid)
  if kill -0 "$SWEEP_PID" 2>/dev/null; then
    kill -- -"$SWEEP_PID" 2>/dev/null || kill "$SWEEP_PID" 2>/dev/null
    for i in $(seq 1 24); do
      kill -0 "$SWEEP_PID" 2>/dev/null || break
      sleep 5
    done
  fi
  rm -f /tmp/cpu_sweep.pid
fi

echo "== bench (1024 reads, default chunk; includes tpu_smoke) =="
python bench.py >"$OUT/bench.json" 2>"$OUT/bench.log"
tail -5 "$OUT/bench.log"; cat "$OUT/bench.json"

echo "== A/B: host-floor offload levers (tpu_smoke skipped) =="
for ab in "TH_DEVICE_SEED=1 TH_DEVICE_CHAIN=1" "TH_DEVICE_SEED=1" ""; do
  echo "--- env: ${ab:-default} ---" | tee -a "$OUT/ab_offload.log"
  env $ab TH_SKIP_TPU_SMOKE=1 python bench.py \
    2>>"$OUT/ab_offload.log" | tee -a "$OUT/ab_offload.log"
done

echo "== VPU dtype/SWAR microbench (lane-packing evidence) =="
timeout 900 python evals/dtype_micro.py 2>&1 | tee "$OUT/dtype_micro.log"

echo "== chunk sweep (tpu_smoke skipped; warmed cache per process) =="
for c in 256 512 1024; do
  echo "--- chunk=$c ---" | tee -a "$OUT/chunk_sweep.log"
  TH_SKIP_TPU_SMOKE=1 BENCH_CHUNK=$c python bench.py \
    2>>"$OUT/chunk_sweep.log" | tee -a "$OUT/chunk_sweep.log"
done

echo "== test.fq steady state =="
( time python -m tidehunter_tpu.cli -f 2 /root/reference/test.fq \
    -o "$OUT/testfq.out" ) 2>&1 | tee "$OUT/testfq.log"

echo "== 15-config accuracy sweep (1000 reads/config) =="
python evals/accuracy.py --reads 1000 --device tpu \
  2>&1 | tee "$OUT/sweep.log"

echo "done; update evals/RESULTS.md from $OUT"
