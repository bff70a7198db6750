#!/usr/bin/env bash
# 5-fold split experiment driver (equivalent of the reference
# configs/experiment_configs/schedule_experiments.sh): trains each split and
# validates the run's snapshotted config.
set -euo pipefail
CONFIG=${1:?usage: schedule_experiments.sh <config.yml> [splits...]}
shift || true
SPLITS=("${@:-0 1 2 3 4}")
cd "$(dirname "$0")/.."
for SPLIT in ${SPLITS[@]}; do
  echo "=== split $SPLIT ==="
  python train.py --config_file "$CONFIG" --split "$SPLIT"
  LATEST=$(ls -td "$(python - "$CONFIG" <<'EOF'
import sys, yaml
print(yaml.safe_load(open(sys.argv[1]))["Output"]["save_dir"])
EOF
)"/*/ | head -1)
  python validate.py --config_file "${LATEST}config.yml" --split "$SPLIT" --epoch latest
done
