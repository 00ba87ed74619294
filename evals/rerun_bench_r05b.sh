#!/bin/bash
# Post-optimization re-measure (after: MSA int16 counts, iden-only
# wavefront variant, sub-tile batch shapes, test.fq chunk=100).
# Writes evals/hw_r05/bench_b.{json,log} and ab_offload_b.log.
set -u
cd "$(dirname "$0")/.."
OUT=evals/hw_r05
mkdir -p "$OUT"

echo "== bench (full: tpu_smoke + synthetic + test.fq) =="
python bench.py >"$OUT/bench_b.json" 2>"$OUT/bench_b.log"
tail -10 "$OUT/bench_b.log"; cat "$OUT/bench_b.json"

echo "== A/B: hybrid device-seed (smoke/test.fq skipped) =="
env TH_DEVICE_SEED=1 TH_SKIP_TPU_SMOKE=1 TH_SKIP_TESTFQ=1 python bench.py \
  >"$OUT/ab_offload_b.log" 2>&1
grep -E "reps:|value" "$OUT/ab_offload_b.log"
echo done
