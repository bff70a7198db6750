#!/bin/bash
# Bounded S-GAN joint-training evidence run (reference recipe:
# configs/config_gan_ves_seg.yml — 100 epochs, batch 4, lr 2e-4, LSGAN +
# DiceBCE; reference models/gan_seg_model.py). Run a bounded number of
# epochs at batch 2 (the remat'd 3x-1216² segmentor joint step is proven at
# batch 2 on a 16 GB v5e) with the same fault-auto-resume machinery as
# run_recipe_train.sh: each attempt exits cleanly after --epochs_per_run
# epochs (axon client leaks host RSS per epoch) and resumes from the run
# dir's own config snapshot.
set -u
OUT=${1:-results/recipe_gan_ves_seg}
EPOCHS=${2:-6}
PER_RUN=${3:-2}
BASE_ARGS=(--Train.epochs "$EPOCHS" --Train.epochs_decay 0
  --Train.batch_size 2
  --Output.save_dir "$OUT")

probe_tpu() {
  # 120s-bounded tiny-matmul device probe in a throwaway process (the
  # tunnel has documented multi-hour outages; a train.py launched into one
  # hangs on first device contact and burns its whole 7200s attempt).
  timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print(float(jnp.sum(x @ x)))" >/dev/null 2>&1
}

for attempt in $(seq 1 40); do
  until probe_tpu; do
    echo "=== TPU probe failed (tunnel outage) — re-probing in 120s ==="
    sleep 120
  done
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
    echo "gan recipe training complete at epoch $last (run $rundir)"
    exit 0
  fi
  echo "=== attempt $attempt: epoch $last (resume dir: ${rundir:-none}) ==="
  if [ "$last" -gt 0 ] && [ -n "$rundir" ]; then
    timeout 7200 python train.py --config_file "$rundir/config.yml" \
      --Train.epochs "$EPOCHS" --start_epoch "$last" \
      --epochs_per_run "$PER_RUN"
  else
    timeout 7200 python train.py \
      --config_file configs/config_gan_ves_seg.yml \
      "${BASE_ARGS[@]}" --epochs_per_run "$PER_RUN"
  fi
  rc=$?
  echo "=== attempt $attempt exited rc=$rc ==="
  # Ship the furthest-along checkpoints into the repo after EVERY attempt
  # and COMMIT them: results/ is gitignored and wiped between driver
  # sessions, so waiting until the run "finishes" loses the weights if the
  # session dies first (this happened twice — see docs/TRAINING_DEMO.md
  # retention caveat). ship_trained_models.py validates both checkpoints
  # and never regresses the shipped epoch, so running it after a killed
  # attempt is safe.
  if python scripts/ship_trained_models.py; then
    echo "=== shipped latest checkpoints to docker/trained_models ==="
    if ! git diff --quiet -- docker/trained_models \
        || [ -n "$(git ls-files --others -- docker/trained_models)" ]; then
      git add docker/trained_models \
        && git commit -q -m "Ship S-GAN recipe checkpoints (auto, per-attempt)" \
          -- docker/trained_models \
        && echo "=== committed shipped checkpoints ===" \
        || echo "=== ship commit FAILED (non-fatal) ==="
    fi
  else
    echo "=== ship FAILED rc=$? (non-fatal) ==="
  fi
  [ $rc -ne 0 ] && sleep 30
done
echo "gan recipe training did NOT complete"
exit 1
