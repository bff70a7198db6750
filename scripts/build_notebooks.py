#!/usr/bin/env python
"""(Re)build the two guided example notebooks from cell definitions.

The notebooks mirror the reference's two tutorials cell-for-topic
(reference ``example_custom_vessel_simulation.ipynb`` /
``example_train_gan-seg_with_new_dataset.ipynb``) but drive the TPU-native
pipeline. Regenerate with ``python scripts/build_notebooks.py``, execute
with ``jupyter nbconvert --to notebook --execute --inplace <nb>``.
"""
import json
import os

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def md(src):
    return {"cell_type": "markdown", "metadata": {},
            "source": src.splitlines(keepends=True)}


def code(src):
    return {"cell_type": "code", "metadata": {}, "execution_count": None,
            "outputs": [], "source": src.splitlines(keepends=True)}


def write(path, cells):
    nb = {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3",
                           "language": "python", "name": "python3"},
            "language_info": {"name": "python", "version": "3"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }
    with open(os.path.join(repo, path), "w") as f:
        json.dump(nb, f, indent=1)
    print("wrote", path, f"({len(cells)} cells)")


# ---------------------------------------------------------------------------
# Notebook 1: custom vessel simulation
# ---------------------------------------------------------------------------

sim_cells = [
    md("""# Example: Generate custom vessel graphs

This notebook shows how to generate new synthetic retinal vessel maps with
the TPU-native simulation engine — the same workflow as the reference
project's tutorial, but the growth runs as one batched, jit-compiled XLA
program (`octa_tpu.sim.greenhouse`) instead of one CPU process per sample.

You will: (1) look at the bundled default graphs, (2) customize the
simulation config, (3) grow a batch of samples on the accelerator, and
(4) render and analyze the results."""),
    md("""## Prerequisites

Everything this notebook needs ships with the repo: the `octa_tpu`
package, the bundled `datasets/vessel_graphs`, and the simulation configs.
It runs on a TPU if one is visible, and falls back to CPU otherwise
(set `OCTA_TPU_PLATFORM=cpu` to force CPU — growth takes a few minutes
there instead of seconds)."""),
    code("""import time

import numpy as np
import yaml
from glob import glob
from matplotlib import pyplot as plt

import octa_tpu  # applies the platform/compile-cache setup
import jax

from octa_tpu.ops import raster
from octa_tpu.sim import greenhouse as gh

print("backend:", jax.default_backend())"""),
    md("""## 1. Visualize the default settings (optional)

The repo bundles 500 pre-generated vessel graphs as CSV edge lists
(`node1`, `node2`, `radius`). `octa_tpu.ops.raster` renders an edge list
to an image with the distance-field splatting kernel (a Pallas kernel on
TPU, an XLA scan on CPU)."""),
    code("""SOURCE_DIR = "datasets/vessel_graphs"
csv_path = sorted(glob(f"{SOURCE_DIR}/*.csv"))[0]
arrays = raster.parse_graph_csv(csv_path)
img, _ = raster.rasterize_forest(arrays, [512, 512], 2)

plt.figure(figsize=(5, 5))
plt.imshow(np.asarray(img), cmap="gray")
plt.title(f"{csv_path.split('/')[-1]} ({len(arrays['radius'])} edges)")
plt.axis("off")
plt.show()"""),
    md("""## 2. Configure the vessel simulation

All simulation behavior is driven by a YAML config (schema-compatible
with the reference): `Greenhouse` holds the growth physics — simulation
space size, FAZ geometry, and one entry per *mode* (SVC/ICP/DCP plexus
passes) with its iteration count `I`, sink count `N`, attraction radii
`delta_*`, and spacing thresholds `eps_*` — and `Forest` configures the
initial stumps. We start from the default config and customize it."""),
    code("""with open("configs/vessel_graph_gen.yml") as f:
    config = yaml.safe_load(f)

print(yaml.dump({"Greenhouse": {
    k: v for k, v in config["Greenhouse"].items() if k != "modes"}},
    sort_keys=False))
print("modes:", [m["name"] for m in config["Greenhouse"]["modes"]],
      "| iterations:", [m["I"] for m in config["Greenhouse"]["modes"]])"""),
    code("""# Customize: a denser, quicker demo — fewer growth iterations,
# more stump trees, and a narrower FAZ (the foveal avascular zone).
config["Greenhouse"]["modes"][0]["I"] = 40
if len(config["Greenhouse"]["modes"]) > 1:
    config["Greenhouse"]["modes"][1]["I"] = 20
config["Greenhouse"]["FAZ_radius_bound"] = [0.35, 0.02]
config["Forest"]["N_trees"] = 8

with open("configs/my_custom_config.yml", "w") as f:
    yaml.dump(config, f, sort_keys=False)
print("saved configs/my_custom_config.yml")"""),
    md("""## 3. Simulate vessel graphs

`Greenhouse.develop_forest(batch=...)` grows a whole batch of independent
samples in one compiled program — on a TPU the batch rides the vector
units together, so growing 2 samples costs barely more than growing 1
(the CLI `generate_vessel_graph.py` uses the same API, shards the batch
over every visible device, and streams CSVs to an output tree).

The first call compiles the growth segments (~20-40 s on TPU); repeat
calls hit the persistent compile cache."""),
    code("""g = gh.Greenhouse(config["Greenhouse"], seed=7)
t0 = time.time()
state = g.develop_forest(config["Forest"], batch=2)
n_art = np.asarray(state.art.n_nodes)
n_ven = np.asarray(state.ven.n_nodes)
print(f"grew 2 samples in {time.time() - t0:.1f}s "
      f"(arterial nodes {n_art.tolist()}, venous nodes {n_ven.tolist()})")"""),
    code("""import os

OUT = "results/example_sim"
os.makedirs(OUT, exist_ok=True)
for i in range(2):
    art = gh.forest_to_edges(state.art, i)
    ven = gh.forest_to_edges(state.ven, i)
    gh.save_edges_csv([art, ven], f"{OUT}/sample_{i}.csv")
print("CSV edge lists:", sorted(glob(f"{OUT}/*.csv")))"""),
    md("""## 4. Visualize the new settings

Render each grown graph at display resolution (304²) and as a
segmentation label (1216², binarized) — the same raster path
`visualize_vessel_graphs.py` uses."""),
    code("""fig, axes = plt.subplots(2, 2, figsize=(9, 9))
for i in range(2):
    arrays = raster.parse_graph_csv(f"{OUT}/sample_{i}.csv")
    img, _ = raster.rasterize_forest(arrays, [304, 304], 2)
    lab, _ = raster.rasterize_forest(arrays, [1216, 1216], 2)
    axes[0, i].imshow(np.asarray(img), cmap="gray")
    axes[0, i].set_title(f"sample {i} (304², gray)")
    axes[1, i].imshow(np.asarray(lab) / 255.0 > 0.1, cmap="gray")
    axes[1, i].set_title(f"sample {i} label (1216², binary)")
for ax in axes.ravel():
    ax.axis("off")
plt.tight_layout()
plt.show()"""),
    md("""You can analyze the simulation by growing with
`collect_stats=True`, which records the alive-sink and node counts per
iteration (the reference's growth-over-time plot)."""),
    code("""state2, stats = g.develop_forest(config["Forest"], batch=1,
                                 collect_stats=True)
stats = np.asarray(stats)  # [batch, iters, series]
fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
ax1.plot(stats[0, :, 0], label="arterial nodes")
ax1.plot(stats[0, :, 1], label="venous nodes")
ax1.set_xlabel("iteration"); ax1.set_ylabel("nodes"); ax1.legend()
ax2.plot(stats[0, :, 2], label="alive oxygen sinks")
ax2.plot(stats[0, :, 3], label="alive CO2 sources")
ax2.set_xlabel("iteration"); ax2.legend()
plt.tight_layout(); plt.show()"""),
    md("""# What's next?

Congratulations — you generated your own vessel graphs! From here you can:

- scale up: `python generate_vessel_graph.py --config_file
  configs/my_custom_config.yml --num_samples 500` batches the growth and
  shards it across every visible TPU chip;
- render variations: `python visualize_vessel_graphs.py` adds radius
  dropout, binarization, 3D NIfTI export and MIP projections;
- feed the graphs into GAN-seg training — see
  `example_train_gan-seg_with_new_dataset.ipynb`."""),
]

# ---------------------------------------------------------------------------
# Notebook 2: train the pipeline on a new dataset
# ---------------------------------------------------------------------------

gan_cells = [
    md("""# Example: Train the entire pipeline with a new dataset

This notebook walks the full S-GAN workflow on a *new* image dataset: use
the GAN to make synthetic vessel renderings look like your images, then
train a segmentor on the GAN-augmented synthetics — no manual labels.
Every step drives the TPU-native trainer (`train.py` /
`octa_tpu.train.engine`), whose configs are schema-compatible with the
reference project's.

For the demo we stand in the repo's bundled 500-image OCTA dataset for
"your dataset" and run *bounded* training (one short epoch each) so the
notebook executes in minutes; the full recipes are linked at each step."""),
    md("""## Prerequisites

- A dataset of 2D OCTA images (here: `datasets/images/*.png`).
- Synthetic vessel graphs (bundled under `datasets/vessel_graphs`, or
  generate your own with `example_custom_vessel_simulation.ipynb`).
- One visible accelerator. The joint 1216² steps want a 16 GB TPU; this
  demo uses the stock configs at batch 2."""),
    code("""import copy
import os
import subprocess
import sys

import numpy as np
import yaml
from glob import glob
from matplotlib import pyplot as plt
from PIL import Image

import octa_tpu
import jax

print("backend:", jax.default_backend())


def run(cmd):
    print("$", " ".join(cmd))
    r = subprocess.run(cmd, capture_output=True, text=True)
    print(r.stdout[-2000:] or r.stderr[-2000:])
    assert r.returncode == 0, r.stderr[-2000:]"""),
    md("""## 1. GAN training

### 1.1 Configure the GAN config file

`configs/config_gan_ves_seg.yml` trains generator, discriminator and
segmentor jointly (the paper's S-GAN). Point `Train.data.real_B.files`
at *your* images; here we keep the bundled glob and shrink the run to a
single demo epoch over a 50-image subset."""),
    code("""with open("configs/config_gan_ves_seg.yml") as f:
    config = yaml.safe_load(f)

YOUR_DATASET_PATH = "datasets/images/*.png"  # TODO: your images here
config["Train"]["data"]["real_B"]["files"] = YOUR_DATASET_PATH
assert glob(YOUR_DATASET_PATH), "no images found at YOUR_DATASET_PATH"

# demo bounds: 1 epoch, batch 2, and a 50-sample subset of both sides
# via the bundled index-split file (epoch length = max of the two sides)
config["Train"]["epochs"] = 1
config["Train"]["batch_size"] = 2
for side in ("real_A", "real_A_seg", "real_B"):
    config["Train"]["data"][side]["split"] = "configs/splits/val_0.txt"
config["Output"]["save_dir"] = "./results/example_gan_seg"

with open("configs/my_custom_gan_config.yml", "w") as f:
    yaml.dump(config, f, sort_keys=False)
print("saved configs/my_custom_gan_config.yml")"""),
    md("""### 1.2 Train the joint GAN-seg model

One epoch here is a smoke test (~3-6 min including the first-time
compile). The production recipe is
`bash scripts/run_recipe_gan.sh results/recipe_gan_ves_seg 20 2` — it
auto-resumes across faults, records Val DSC/clDice per epoch, and ships
the latest checkpoints into `docker/trained_models/`."""),
    code("""run([sys.executable, "train.py",
     "--config_file", "configs/my_custom_gan_config.yml"])
RUN_DIR = sorted(glob("results/example_gan_seg/*"))[-1]
print("run dir:", RUN_DIR)
print(open(f"{RUN_DIR}/metrics.csv").read())"""),
    md("""### 1.3 Validate your generator (optional)

`test.py` runs the trained generator on held-out synthetic graphs and
writes the translated images. With only one demo epoch the translation
is crude; the committed `docker/trained_models/GAN` checkpoint shows the
target quality."""),
    code("""run([sys.executable, "test.py",
     "--config_file", f"{RUN_DIR}/config.yml",
     "--epoch", "latest", "--num_samples", "2"])
test_imgs = sorted(glob(f"{RUN_DIR}/test/*.png"))[:2]
fig, axes = plt.subplots(1, len(test_imgs), figsize=(9, 4.5))
for ax, p in zip(np.atleast_1d(axes), test_imgs):
    ax.imshow(Image.open(p), cmap="gray")
    ax.set_title(p.split("/")[-1]); ax.axis("off")
plt.tight_layout(); plt.show()"""),
    md("""## 2. Vessel segmentation training

### 2.1 Configure the segmentation config

`configs/config_ves_seg-S_GAN.yml` trains a DynUNet on synthetic
graph/label pairs, passing each rendering through your trained generator
(`ImageToImageTranslationd`) so the segmentor sees realistic-looking
inputs. Point `model_path` at the generator checkpoint from step 1."""),
    code("""with open("configs/config_ves_seg-S_GAN.yml") as f:
    seg_config = yaml.safe_load(f)

GAN_CHECKPOINT_PATH = f"{RUN_DIR}/checkpoints/latest_generator_model.ckpt"
assert os.path.exists(GAN_CHECKPOINT_PATH)
for t in seg_config["Train"]["data_augmentation"]:
    if t["name"] == "ImageToImageTranslationd":
        t["model_path"] = GAN_CHECKPOINT_PATH

seg_config["Train"]["epochs"] = 1
seg_config["Train"]["batch_size"] = 2
seg_config["Train"]["val_interval"] = 1
for side in ("image", "label"):  # 50-sample demo subset
    seg_config["Train"]["data"][side]["split"] = "configs/splits/val_0.txt"
seg_config["Output"]["save_dir"] = "./results/example_ves_seg"

with open("configs/my_custom_ves_seg_config.yml", "w") as f:
    yaml.dump(seg_config, f, sort_keys=False)
print("saved configs/my_custom_ves_seg_config.yml")"""),
    md("""### 2.2 Train the segmentation network

Again a single bounded epoch; the full 30-epoch recipe
(`bash scripts/run_recipe_train.sh`) reaches Val DSC ≈ 0.82 on the
bundled data (`docs/TRAINING_DEMO.md`)."""),
    code("""run([sys.executable, "train.py",
     "--config_file", "configs/my_custom_ves_seg_config.yml"])
SEG_RUN_DIR = sorted(glob("results/example_ves_seg/*"))[-1]
print("run dir:", SEG_RUN_DIR)
print(open(f"{SEG_RUN_DIR}/metrics.csv").read())"""),
    md("""### 2.3 Test the segmentation model

Run inference on real images and display input vs prediction. (For a
rigorous evaluation against labels use `validate.py`, which reports
DSC/clDice/AUC per image.)"""),
    code("""run([sys.executable, "test.py",
     "--config_file", f"{SEG_RUN_DIR}/config.yml",
     "--epoch", "latest", "--num_samples", "2"])
pred_paths = sorted(glob(f"{SEG_RUN_DIR}/test/*.png"))[:2]
fig, axes = plt.subplots(1, len(pred_paths), figsize=(9, 4.5))
for ax, p in zip(np.atleast_1d(axes), pred_paths):
    ax.imshow(Image.open(p), cmap="gray")
    ax.set_title(p.split("/")[-1]); ax.axis("off")
plt.tight_layout(); plt.show()"""),
    md("""# What's next?

Congratulations, you trained the full pipeline on a new dataset! 🎉
To productionize:

- run the full recipes (`scripts/run_recipe_gan.sh`,
  `scripts/run_recipe_train.sh`) instead of the 1-epoch demos;
- validate with `python validate.py --config_file <run>/config.yml` and
  sweep post-processing with the HPO harness (`python bayesOpt.py`);
- package your checkpoints for inference with
  `scripts/ship_trained_models.py` + `scripts/run_modes.sh`
  (the docker workflow)."""),
]

write("example_custom_vessel_simulation.ipynb", sim_cells)
write("example_train_gan-seg_with_new_dataset.ipynb", gan_cells)
