#!/bin/bash
# Round-5 post-training queue, stage 1: wait for the in-flight S-GAN
# recipe launcher (PID $1) to finish, then (a) reproduce the final
# validation metrics with validate.py and (b) capture the banded-nearest
# TPU A/B (scripts/probe_banded_ab.py). Logs to results/r5_stage1.log.
# The TPU is single-process (CLAUDE.md) so everything here is serialized
# behind the trainer.
set -u
cd /root/repo
LAUNCHER_PID=${1:?launcher pid}
OUT=${2:-results/recipe_gan_ves_seg}
LOG=results/r5_stage1.log

{
  echo "=== waiting for launcher pid $LAUNCHER_PID ($(date)) ==="
  while ps -p "$LAUNCHER_PID" > /dev/null 2>&1; do sleep 60; done
  echo "=== launcher exited ($(date)) ==="
  sleep 10

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
  echo "=== final epoch $last (run $rundir); validate.py reproduction ==="
  for try in 1 2 3; do
    timeout 1800 python validate.py --config_file "$rundir/config.yml" \
      --epoch latest && break
    echo "=== validate attempt $try failed; retry in 60s ==="
    sleep 60
  done

  echo "=== banded-nearest TPU A/B ($(date)) ==="
  for try in 1 2 3; do
    timeout 3000 python scripts/probe_banded_ab.py 16 \
      docker/vessel_graph_gen_docker_config.yml && break
    echo "=== A/B attempt $try failed; retry in 120s ==="
    sleep 120
  done
  echo "=== stage 1 done ($(date)) ==="
} > "$LOG" 2>&1
