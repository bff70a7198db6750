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
    # Reference docker/dockershell.sh:8 — segment with the shipped
    # trained_models/ves_seg-S-GAN checkpoint. The shipped config's
    # docker-internal /var/... paths are overridden to repo-relative
    # defaults here; pass DATASET_DIR/OUT_DIR (or explicit dotted
    # overrides in "$@") to redirect.
    python test.py --config_file docker/trained_models/ves_seg-S-GAN/config.yml \
      --General.inference model \
      --Test.data.image.files "${DATASET_DIR:-datasets/images}/*.png" \
      --Test.save_dir "${OUT_DIR:-./results/segmented}" "$@"
    ;;
  generation)
    python generate_vessel_graph.py --config_file configs/vessel_graph_gen.yml \
      --num_samples "${NUM_SAMPLES:-10}" "$@"
    # GAN-translate the fresh graphs into realistic OCTA images — the
    # middle stage of the reference's generation mode
    # (docker/dockershell.sh:10-17: graph-gen -> trained_models/GAN
    # test.py -> label render). Uses the newest joint-GAN training run's
    # config snapshot (its Output.save_dir holds the checkpoints);
    # override with GAN_RUN_DIR.
    # `|| true` guards set -e/pipefail: with no trained run the ls exits 2
    # and would otherwise kill the whole generation mode here
    GAN_RUN=${GAN_RUN_DIR:-$(ls -d results/recipe_gan_ves_seg/*/ 2>/dev/null | sort | tail -1 || true)}
    if [ -n "${GAN_RUN:-}" ] && [ -f "${GAN_RUN%/}/config.yml" ]; then
      python test.py --config_file "${GAN_RUN%/}/config.yml" \
        --General.inference G --epoch latest \
        --Test.data.real_A.files "./results/vessel_graphs/*.csv" \
        --Test.save_dir ./results/images
    elif ls docker/trained_models/GAN/*_G_model.ckpt >/dev/null 2>&1; then
      # no training run on disk — use the checkpoint shipped in-repo
      # (mirrors the reference docker image, which ships trained_models/GAN)
      python test.py --config_file docker/trained_models/GAN/config.yml \
        --Test.model_path "$(ls docker/trained_models/GAN/*_G_model.ckpt | sort | tail -1)" \
        --Test.data.real_A.files "./results/vessel_graphs/*.csv" \
        --Test.save_dir ./results/images
    else
      echo "[warn] no trained GAN run under results/recipe_gan_ves_seg" \
           "(set GAN_RUN_DIR to a run dir with config.yml + checkpoints);" \
           "skipping the GAN-translation stage"
    fi
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
