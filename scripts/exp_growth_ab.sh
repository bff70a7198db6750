#!/bin/bash
# Growth perf A/B: scan-unroll values (and the working-tree nearest-scan
# block heuristic) on the docker schedule, batch 32, 2 trials each in fresh
# processes. Run ONLY when the TPU is otherwise idle.
set -u
for unroll in 1 2; do
  echo "=== OCTA_TPU_SCAN_UNROLL=$unroll ==="
  OCTA_TPU_SCAN_UNROLL=$unroll timeout 3000 \
    python scripts/bench_growth.py 32 docker/vessel_graph_gen_docker_config.yml
done
