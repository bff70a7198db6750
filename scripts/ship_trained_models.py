#!/usr/bin/env python
"""Ship the best joint S-GAN recipe checkpoints into docker/trained_models.

The reference docker image ships its trained weights at
``docker/trained_models/{GAN,ves_seg-S-GAN}`` (reference
``docker/dockershell.sh:10-17`` loads them for the generation /
segmentation modes). Our training runs live under ``results/`` which is
gitignored AND wiped between driver sessions — this script copies the
latest generator/segmentor checkpoints of the most-advanced recipe run to
the in-repo shipped paths and points the two shipped config.yml files at
them, so ``scripts/run_modes.sh`` and ``bench.py``'s accuracy riders
keep working from a fresh clone.

Safety rules (round-4 advisor findings):
  * the candidate run is selected the same way the launcher resumes —
    max last-epoch across ``*/metrics.csv`` — not by directory name, so an
    aborted fresh run can never shadow an older, further-along run;
  * BOTH checkpoints are fully deserialized before anything in
    ``docker/trained_models`` is touched (a SIGTERM mid-save leaves a
    truncated file, which must never replace a good shipped one);
  * shipping never regresses: if the already-shipped checkpoint carries a
    higher epoch tag, the candidate is skipped;
  * the copy goes to a temp file in the destination dir and is moved into
    place with ``os.replace``; old checkpoints are removed only afterwards.

Usage: python scripts/ship_trained_models.py [run_dir]
       (default: the furthest-along results/recipe_gan_ves_seg/*/ run)
"""
import csv
import glob
import os
import re
import shutil
import sys

import yaml

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(repo)


def last_epoch(run_dir: str) -> int:
    """1-indexed last epoch recorded in the run's metrics.csv (0 if none)."""
    try:
        rows = list(csv.DictReader(open(os.path.join(run_dir, "metrics.csv"))))
        return int(rows[-1]["epoch"]) + 1 if rows else 0
    except Exception:
        return 0


if len(sys.argv) > 1:
    run = sys.argv[1].rstrip("/")
else:
    # Same selection rule as scripts/run_recipe_gan.sh's resume scan.
    runs = [d.rstrip("/") for d in glob.glob("results/recipe_gan_ves_seg/*/")]
    if not runs:
        sys.exit("ship: no run under results/recipe_gan_ves_seg")
    run = max(runs, key=last_epoch)
    if last_epoch(run) == 0:
        sys.exit(f"ship: no run with a recorded epoch under "
                 f"results/recipe_gan_ves_seg (newest: {run})")

sys.path.insert(0, repo)
from octa_tpu.io.checkpoints import load_checkpoint  # noqa: E402

g_src = f"{run}/checkpoints/latest_generator_model.ckpt"
s_src = f"{run}/checkpoints/latest_segmentor_model.ckpt"

# Fully deserialize BOTH checkpoints before touching the shipped tree.
try:
    g_ck = load_checkpoint(g_src)
    s_ck = load_checkpoint(s_src)
except Exception as e:  # truncated / missing / corrupt
    sys.exit(f"ship: candidate checkpoint failed validation ({e}); "
             "leaving docker/trained_models untouched")
# The ckpt "epoch" field is already the 1-indexed completed epoch
# (engine.py saves with epoch + 1 — see octa_tpu/train/engine.py:196).
epoch = int(g_ck.get("epoch", 1))


def shipped_epoch(dst_dir: str) -> int:
    tags = [int(m.group(1)) for p in glob.glob(f"{dst_dir}/*_model.ckpt")
            if (m := re.match(r"(\d+)_", os.path.basename(p)))]
    return max(tags, default=0)


ship = {
    g_src: f"docker/trained_models/GAN/{epoch}_G_model.ckpt",
    s_src: f"docker/trained_models/ves_seg-S-GAN/{epoch}_model.ckpt",
}
# No-regress check for ALL destinations BEFORE copying anything: the
# shipped G/segmentor pair must be replaced atomically as a unit — a
# per-destination check inside the copy loop could replace the generator
# and then bail on the segmentor, leaving a mismatched pair (round-4
# advisor finding).
for dst in ship.values():
    have = shipped_epoch(os.path.dirname(dst))
    if have > epoch:
        sys.exit(f"ship: shipped epoch {have} in {os.path.dirname(dst)} is "
                 f"ahead of candidate epoch {epoch}; refusing to regress")
for src, dst in ship.items():
    dst_dir = os.path.dirname(dst)
    os.makedirs(dst_dir, exist_ok=True)
    tmp = os.path.join(dst_dir, ".ship_tmp.ckpt")
    shutil.copyfile(src, tmp)
    load_checkpoint(tmp)  # verify the copy itself deserializes
    os.replace(tmp, dst)
    for old in glob.glob(os.path.join(dst_dir, "*_model.ckpt")):
        if os.path.abspath(old) != os.path.abspath(dst):
            os.remove(old)  # keep exactly one shipped checkpoint per model
    print(f"{src} -> {dst} ({os.path.getsize(dst) / 1e6:.1f} MB)")

for cfg_path, dst in (("docker/trained_models/GAN/config.yml",
                       ship[g_src]),
                      ("docker/trained_models/ves_seg-S-GAN/config.yml",
                       ship[s_src])):
    cfg = yaml.safe_load(open(cfg_path))
    cfg["Test"]["model_path"] = "./" + dst
    yaml.safe_dump(cfg, open(cfg_path, "w"), sort_keys=False)
    print(f"{cfg_path}: Test.model_path -> ./{dst}")
