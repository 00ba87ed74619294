#!/bin/bash
# Round-5 hardware measurement round: run after the TPU tunnel is
# confirmed up (python -c "import jax; print(jax.devices())" returns an
# axon device in seconds, not minutes).  Produces, under evals/hw_r05/:
#   bench.json/.log      headline bench + tpu_smoke + test.fq metric +
#                        stage/Gcell attribution (async MSA pull, new
#                        sub_b ladder in effect)
#   ab_offload.log       A/B: default / hybrid (device seed + host chain)
#                        / full device seed+chain
#   offload_micro2.log   fused-offload stage decomposition (quarter-block
#                        unpack, packed-key seed, full-window chain)
#   dtype_micro.log      VPU dtype/SWAR roofline column (VERDICT r4 #3)
#   msa_micro.log        DeviceMSA step split (scores/DP/backtrack/update)
#   mesh_overhead.log    TH_MESH=-1 (forced 1-chip mesh) vs meshless
# Steps ordered by round-gate priority; each independently resumable.
# NOTE: the tunnel is single-tenant — stop any probe/bench process first.
set -u
cd "$(dirname "$0")/.."
OUT=evals/hw_r05
mkdir -p "$OUT"

echo "== bench (1024 reads; includes tpu_smoke + test.fq metric) =="
python bench.py >"$OUT/bench.json" 2>"$OUT/bench.log"
tail -8 "$OUT/bench.log"; cat "$OUT/bench.json"

echo "== A/B: offload modes (tpu_smoke/test.fq skipped) =="
: >"$OUT/ab_offload.log"
for ab in "" "TH_DEVICE_SEED=1" "TH_DEVICE_SEED=1 TH_DEVICE_CHAIN=1"; do
  echo "--- env: ${ab:-default(host seed+chain)} ---" | tee -a "$OUT/ab_offload.log"
  env $ab TH_SKIP_TPU_SMOKE=1 TH_SKIP_TESTFQ=1 python bench.py \
    2>>"$OUT/ab_offload.log" | tee -a "$OUT/ab_offload.log"
done

echo "== fused offload stage decomposition =="
timeout 900 python evals/offload_micro2.py 512 >"$OUT/offload_micro2.log" 2>&1
grep -v WARNING "$OUT/offload_micro2.log"

echo "== VPU dtype/SWAR roofline column =="
timeout 900 python evals/dtype_micro.py 2>&1 | tee "$OUT/dtype_micro.log"

echo "== DeviceMSA step split =="
timeout 900 python evals/msa_micro.py 512 >"$OUT/msa_micro.log" 2>&1
grep -v WARNING "$OUT/msa_micro.log"

echo "== 1-chip mesh overhead A/B =="
: >"$OUT/mesh_overhead.log"
for ab in "TH_MESH=1" "TH_MESH=-1"; do
  echo "--- env: $ab ---" | tee -a "$OUT/mesh_overhead.log"
  env $ab TH_SKIP_TPU_SMOKE=1 TH_SKIP_TESTFQ=1 BENCH_REPS=2 python bench.py \
    2>>"$OUT/mesh_overhead.log" | tee -a "$OUT/mesh_overhead.log"
done

echo "done; update evals/RESULTS.md from $OUT"
