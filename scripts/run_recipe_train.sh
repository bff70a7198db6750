#!/bin/bash
# Recipe-scale supervised segmentation training (reference recipe:
# configs/config_ves_seg-S_GAN.yml:22-28 — 30 epochs, last 10 linear decay,
# batch 4, lr 1e-4, DiceBCE) on the bundled 500-sample dataset with a
# 400/50 train/val split, with automatic fault resume: the shared tunneled
# TPU intermittently fails (UNAVAILABLE / remote_compile 500s, CLAUDE.md),
# and a wedged JAX client requires a fresh process — so each retry restarts
# train.py with --start_epoch at the last completed epoch (the engine forks
# a sibling run dir and carries checkpoints, reference resume semantics).
set -u
OUT=${1:-results/recipe_seg_supervised}
EPOCHS=${2:-30}
ARGS=(--config_file configs/config_ves_seg_supervised.yml
  --Train.epochs "$EPOCHS"
  --Train.data.image.split configs/splits/train_0.txt
  --Train.data.label.split configs/splits/train_0.txt
  --Validation.data.image.split configs/splits/val_0.txt
  --Validation.data.label.split configs/splits/val_0.txt
  --Output.save_dir "$OUT")

for attempt in $(seq 1 60); do
  last=$(python - "$OUT" <<'EOF'
import csv, glob, sys
best = 0
for f in glob.glob(sys.argv[1] + "/*/metrics.csv"):
    try:
        rows = list(csv.DictReader(open(f)))
        if rows:
            best = max(best, int(rows[-1]["epoch"]) + 1)
    except Exception:
        pass
print(best)
EOF
)
  if [ "$last" -ge "$EPOCHS" ]; then
    echo "recipe training complete at epoch $last"
    exit 0
  fi
  echo "=== attempt $attempt: starting from epoch $last ==="
  timeout 14400 python train.py "${ARGS[@]}" --start_epoch "$last"
  rc=$?
  echo "=== attempt $attempt exited rc=$rc ==="
  [ $rc -eq 0 ] && continue
  sleep 30  # transient tunnel-contention window
done
echo "recipe training did NOT complete"
exit 1
