#!/bin/bash
# Round-3 TPU measurement sequence (run as soon as the tunnel recovers).
# Each step is bounded and logged; a step failure does not stop the rest
# (the shared tunnel flaps — rerun the script to fill gaps). Keep the VM
# otherwise idle: one CPU core, and the TPU is exclusive to one process.
#
#  1. growth microbench, Murray scatter route (round-2 default) — measures
#     the round-3 semantic additions (exact difference-form d², per-node
#     kappa) against round-2's 1.36 s/sample.
#  2. growth microbench, Murray segsum-kernel route (OCTA_TPU_MURRAY_KERNEL=1)
#     — the gated round-2 lever that needed hardware; flip the default if
#     it wins.
#  3. python bench.py — the driver-scope e2e number (BENCH_r03 candidate).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_r3_measure.log}
CFG=docker/vessel_graph_gen_docker_config.yml
{
  echo "=== tpu_r3_measure start $(date -Is) ==="
  echo "--- step 1: bench_growth murray=scatter ---"
  OCTA_TPU_MURRAY_KERNEL=0 timeout 1500 python scripts/bench_growth.py 32 "$CFG"
  echo "rc=$? $(date -Is)"
  echo "--- step 2: bench_growth murray=kernel ---"
  OCTA_TPU_MURRAY_KERNEL=1 timeout 1500 python scripts/bench_growth.py 32 "$CFG"
  echo "rc=$? $(date -Is)"
  echo "--- step 3: bench.py (driver scope) ---"
  timeout 1100 python bench.py
  echo "rc=$? $(date -Is)"
  echo "=== tpu_r3_measure done $(date -Is) ==="
} >> "$LOG" 2>&1
