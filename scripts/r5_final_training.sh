#!/bin/bash
# Round-5 revised training plan: the measured joint-step cost is
# ~1420 s/epoch (not the 350 s/epoch of the seg-only recipe), so epochs
# 17-20 would starve the rest of the round's evidence queue. Cap the
# recipe at epoch 16 (meets the >=15-epoch bar): wait for the in-flight
# epochs-11-12 attempt (PID $1), ship, run ONE 4-epoch attempt to 16,
# ship, validate, then the banded-nearest + bf16-penalty TPU A/B.
set -u
cd /root/repo
TRAIN_PID=${1:?trainer pid}
OUT=${2:-results/recipe_gan_ves_seg}
TARGET=16

ship() {
  if python scripts/ship_trained_models.py; then
    echo "=== shipped latest checkpoints ==="
    if ! git diff --quiet -- docker/trained_models \
        || [ -n "$(git ls-files --others -- docker/trained_models)" ]; then
      git add docker/trained_models \
        && git commit -q -m "Ship S-GAN recipe checkpoints (auto, per-attempt)" \
          -- docker/trained_models \
        && echo "=== committed shipped checkpoints ==="
    fi
  else
    echo "=== ship FAILED rc=$? (non-fatal) ==="
  fi
}

probe_tpu() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print(float(jnp.sum(x @ x)))" >/dev/null 2>&1
}

latest_state() {
  python - "$OUT" <<'EOF'
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
}

echo "=== waiting for in-flight trainer pid $TRAIN_PID ($(date)) ==="
while ps -p "$TRAIN_PID" > /dev/null 2>&1; do sleep 60; done
echo "=== trainer exited ($(date)) ==="
sleep 10
ship

read -r last rundir <<< "$(latest_state)"
echo "=== at epoch $last (dir $rundir); resuming to $TARGET in one attempt ==="
for attempt in 1 2 3; do
  read -r last rundir <<< "$(latest_state)"
  [ "$last" -ge "$TARGET" ] && break
  until probe_tpu; do
    echo "=== TPU probe failed — re-probing in 120s ==="
    sleep 120
  done
  per_run=$((TARGET - last))
  timeout 9000 python train.py --config_file "$rundir/config.yml" \
    --Train.epochs "$TARGET" --start_epoch "$last" \
    --epochs_per_run "$per_run"
  echo "=== training attempt $attempt exited rc=$? ==="
  ship
done

read -r last rundir <<< "$(latest_state)"
echo "=== final epoch $last (run $rundir); validate.py reproduction ==="
for try in 1 2 3; do
  timeout 1800 python validate.py --config_file "$rundir/config.yml" \
    --epoch latest --General.inference S && break
  echo "=== validate attempt $try failed; retry in 60s ==="
  sleep 60
done

echo "=== banded-nearest + bf16-pen TPU A/B ($(date)) ==="
for try in 1 2 3; do
  timeout 3600 python scripts/probe_banded_ab.py 16 \
    docker/vessel_graph_gen_docker_config.yml && break
  echo "=== A/B attempt $try failed; retry in 120s ==="
  sleep 120
done
echo "=== r5_final_training done ($(date)) ==="
