#!/bin/bash
# Wait for the recipe-training launcher to finish, then run validate.py on
# the final run dir's best checkpoint (full metric set, batch 1).
set -u
LAUNCHER_PID=${1:?launcher pid}
OUT=${2:-results/recipe_seg_supervised}

while ps -p "$LAUNCHER_PID" > /dev/null 2>&1; do sleep 60; done
sleep 5

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
echo "=== training done at epoch $last; validating $rundir (epoch best) ==="
for try in 1 2 3; do
  timeout 1800 python validate.py --config_file "$rundir/config.yml" \
    --epoch best && exit 0
  echo "=== validate attempt $try failed; retrying (transient tunnel) ==="
  sleep 30
done
exit 1
