#!/usr/bin/env python
"""Ship the newest joint S-GAN recipe checkpoints into docker/trained_models.

The reference docker image ships its trained weights at
``docker/trained_models/{GAN,ves_seg-S-GAN}`` (reference
``docker/dockershell.sh:10-17`` loads them for the generation /
segmentation modes). Our training runs live under ``results/`` which is
gitignored AND wiped between driver sessions — this script copies the
latest generator/segmentor checkpoints of a finished recipe run to the
in-repo shipped paths and points the two shipped config.yml files at
them, so ``scripts/run_modes.sh`` and ``bench.py``'s accuracy riders
keep working from a fresh clone.

Usage: python scripts/ship_trained_models.py [run_dir]
       (default: newest results/recipe_gan_ves_seg/*/ run)
"""
import glob
import os
import shutil
import sys

import yaml

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(repo)

if len(sys.argv) > 1:
    run = sys.argv[1].rstrip("/")
else:
    runs = sorted(glob.glob("results/recipe_gan_ves_seg/*/"))
    if not runs:
        sys.exit("no run under results/recipe_gan_ves_seg")
    run = runs[-1].rstrip("/")

sys.path.insert(0, repo)
from octa_tpu.io.checkpoints import load_checkpoint  # noqa: E402

g_src = f"{run}/checkpoints/latest_generator_model.ckpt"
s_src = f"{run}/checkpoints/latest_segmentor_model.ckpt"
epoch = int(load_checkpoint(g_src).get("epoch", 0)) + 1  # 1-indexed tag

ship = {
    g_src: f"docker/trained_models/GAN/{epoch}_G_model.ckpt",
    s_src: f"docker/trained_models/ves_seg-S-GAN/{epoch}_model.ckpt",
}
for src, dst in ship.items():
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    for old in glob.glob(os.path.join(os.path.dirname(dst), "*_model.ckpt")):
        os.remove(old)  # keep exactly one shipped checkpoint per model
    shutil.copyfile(src, dst)
    print(f"{src} -> {dst} ({os.path.getsize(dst) / 1e6:.1f} MB)")

for cfg_path, dst in (("docker/trained_models/GAN/config.yml",
                       ship[g_src]),
                      ("docker/trained_models/ves_seg-S-GAN/config.yml",
                       ship[s_src])):
    cfg = yaml.safe_load(open(cfg_path))
    cfg["Test"]["model_path"] = "./" + dst
    yaml.safe_dump(cfg, open(cfg_path, "w"), sort_keys=False)
    print(f"{cfg_path}: Test.model_path -> ./{dst}")
