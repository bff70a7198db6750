#!/bin/bash
# Bounded CycleGAN unpaired-translation evidence run (reference recipe:
# configs/config_cycle_gan.yml — 100 epochs at 304², two resnet generators
# + two 70x70 PatchGAN discriminators + ImagePool; reference
# models/cycle_gan.py:146-248 — the docker GAN's training heritage).
# Runs a bounded number of epochs with the same fault-auto-resume and
# tunnel-probe machinery as run_recipe_gan.sh: each attempt exits cleanly
# after --epochs_per_run epochs (the axon client leaks host RSS per epoch)
# and resumes from the run dir's own config snapshot.
set -u
OUT=${1:-results/recipe_cyclegan}
EPOCHS=${2:-4}
PER_RUN=${3:-2}
BASE_ARGS=(--Train.epochs "$EPOCHS" --Train.epochs_decay 0
  --Train.batch_size 2
  --Output.save_dir "$OUT")

probe_tpu() {
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
    echo "cyclegan recipe training complete at epoch $last (run $rundir)"
    exit 0
  fi
  echo "=== attempt $attempt: epoch $last (resume dir: ${rundir:-none}) ==="
  if [ "$last" -gt 0 ] && [ -n "$rundir" ]; then
    timeout 7200 python train.py --config_file "$rundir/config.yml" \
      --Train.epochs "$EPOCHS" --start_epoch "$last" \
      --epochs_per_run "$PER_RUN"
  else
    timeout 7200 python train.py \
      --config_file configs/config_cycle_gan.yml \
      "${BASE_ARGS[@]}" --epochs_per_run "$PER_RUN"
  fi
  rc=$?
  echo "=== attempt $attempt exited rc=$rc ==="
  [ $rc -ne 0 ] && sleep 30
done
echo "cyclegan recipe training did NOT complete"
exit 1
