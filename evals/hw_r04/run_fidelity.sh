#!/bin/bash
# 15-config paper-protocol fidelity sweep (VERDICT r3 task 3):
# production profile-POA vs graph-POA oracle, all other stages identical
# (device engine). Output: evals/hw_r04/fidelity_{profile,graph}.log
cd "$(dirname "$0")/../.."
N=${1:-150}
for axis in profile graph; do
  echo "=== axis=$axis reads=$N $(date -u +%H:%M:%S) ===" > evals/hw_r04/fidelity_$axis.log
  timeout 7200 python evals/accuracy.py --reads $N --device tpu --msa $axis --configs all \
    >> evals/hw_r04/fidelity_$axis.log 2>&1
done
