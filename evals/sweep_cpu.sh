#!/bin/bash
# Reduced-scale CPU insurance sweep: the full 15-config paper protocol
# through the host-oracle pipeline (production profile-POA, then the
# graph-POA oracle) at --reads N (default 120; the protocol scale of
# 1000 reads runs on TPU in run_hw_round.sh — this exists so the round
# still has a 15-row fidelity table if the tunnel never returns).
#
# Records its process-group id in /tmp/cpu_sweep.pid so run_hw_round.sh
# can stop it (exact pgid, never by pattern) before hardware timing.
set -u
cd "$(dirname "$0")/.."
N=${1:-120}
echo "$$" > /tmp/cpu_sweep.pid
trap 'rm -f /tmp/cpu_sweep.pid' EXIT
env -u PALLAS_AXON_POOL_IPS python evals/accuracy.py \
  --reads "$N" --device off > evals/sweep_cpu_profile.log 2>&1
env -u PALLAS_AXON_POOL_IPS python evals/accuracy.py \
  --reads "$N" --msa graph > evals/sweep_cpu_graph.log 2>&1
echo "sweep done $(date)" >> evals/sweep_cpu_profile.log
