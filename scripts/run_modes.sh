#!/usr/bin/env bash
# Pipeline entry modes (equivalent of the reference docker/dockershell.sh):
#   segmentation   — segment OCTA images with a trained model
#   generation     — simulate vessel graphs, GAN-translate to realistic
#                    images, render binarized labels
#   transformation — GAN-translate existing vessel graphs
#   visualization  — render stored vessel graphs as label maps
set -euo pipefail
MODE=${1:?usage: run_modes.sh <segmentation|generation|transformation|visualization> [args...]}
shift || true
cd "$(dirname "$0")/.."

case "$MODE" in
  segmentation)
    python test.py --config_file configs/config_ves_seg-S.yml \
      --General.inference model --epoch latest "$@"
    ;;
  generation)
    python generate_vessel_graph.py --config_file configs/vessel_graph_gen.yml \
      --num_samples "${NUM_SAMPLES:-10}" "$@"
    python visualize_vessel_graphs.py --source_dir ./results/vessel_graphs \
      --out_dir ./results/labels --resolution 1216,1216,16 --binarize
    ;;
  transformation)
    python test.py --config_file configs/config_gan_ves_seg.yml \
      --General.inference G --epoch latest "$@"
    ;;
  visualization)
    python visualize_vessel_graphs.py --source_dir "${SOURCE_DIR:-datasets/vessel_graphs}" \
      --out_dir "${OUT_DIR:-./results/labels}" --resolution 1216,1216,16 --binarize "$@"
    ;;
  *)
    echo "Unknown mode $MODE"; exit 1;;
esac
