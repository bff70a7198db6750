#!/bin/bash
# Recipe-scale supervised segmentation training (reference recipe:
# configs/config_ves_seg-S_GAN.yml:22-28 — 30 epochs, last 10 linear decay,
# batch 4, lr 1e-4, DiceBCE) on the bundled 500-sample dataset with a
# 400/50 train/val split, with automatic fault resume.
#
# Resume follows the reference semantics (visualizer.py:38-58): a resumed
# run is launched FROM THE RUN DIR'S config snapshot (whose Output.save_dir
# is the run dir), and the Visualizer forks a sibling run dir carrying the
# checkpoints. Each attempt exits cleanly after --epochs_per_run epochs:
# the axon TPU client leaks ~11 GB host RSS per epoch at this shape (an
# 11-epoch run OOM-killed a 125 GB host), and clean epoch-boundary exits
# also avoid wedging the shared tunnel the way mid-run kills do.
set -u
OUT=${1:-results/recipe_seg_supervised}
EPOCHS=${2:-30}
PER_RUN=${3:-6}
BASE_ARGS=(--Train.epochs "$EPOCHS"
  --Train.data.image.split configs/splits/train_0.txt
  --Train.data.label.split configs/splits/train_0.txt
  --Validation.data.image.split configs/splits/val_0.txt
  --Validation.data.label.split configs/splits/val_0.txt
  --Output.save_dir "$OUT")

for attempt in $(seq 1 60); do
  # last completed epoch + the run dir that holds it
  read -r last rundir <<< "$(python - "$OUT" <<'EOF'
import csv, glob, sys
best, bdir = 0, ""
for f in glob.glob(sys.argv[1] + "/*/metrics.csv"):
    try:
        rows = list(csv.DictReader(open(f)))
        if rows and int(rows[-1]["epoch"]) + 1 >= best:
            best = int(rows[-1]["epoch"]) + 1
            bdir = f.rsplit("/", 1)[0]
    except Exception:
        pass
print(best, bdir)
EOF
)"
  if [ "$last" -ge "$EPOCHS" ]; then
    echo "recipe training complete at epoch $last (run $rundir)"
    exit 0
  fi
  echo "=== attempt $attempt: epoch $last (resume dir: ${rundir:-none}) ==="
  if [ "$last" -gt 0 ] && [ -n "$rundir" ]; then
    # reference resume: relaunch from the run's own config snapshot
    timeout 4500 python train.py --config_file "$rundir/config.yml" \
      --Train.epochs "$EPOCHS" --start_epoch "$last" \
      --epochs_per_run "$PER_RUN"
  else
    timeout 4500 python train.py \
      --config_file configs/config_ves_seg_supervised.yml \
      "${BASE_ARGS[@]}" --epochs_per_run "$PER_RUN"
  fi
  rc=$?
  echo "=== attempt $attempt exited rc=$rc ==="
  [ $rc -ne 0 ] && sleep 30  # transient tunnel-contention window
done
echo "recipe training did NOT complete"
exit 1
