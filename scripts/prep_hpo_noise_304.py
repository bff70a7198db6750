#!/usr/bin/env python
"""Build the 304² noise-model HPO base config (round-5 VERDICT item 10).

Derives from ``configs/config_ves_seg-S_RA.yml`` (the config family whose
reference counterpart carries the tuned ``max_factor``, reference
``configs/config_ves_seg-S_RA.yml:77-80`` / ``utils/bayesOpt_noise.py:
126-149``): train the supervised ves-seg objective at 304² on a bounded
120-graph subset and score Validation DSC on the real OCTA val split —
the short-training objective ``bayesOpt_noise.py`` tunes
(lambda_speckle, lambda_delta, max_decrease_res) against.

Writes results/hpo_noise_304/base.yml + the 120-index train split.
"""
import os

import yaml

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
out_dir = os.path.join(repo, "results", "hpo_noise_304")
os.makedirs(out_dir, exist_ok=True)

with open(os.path.join(repo, "configs", "config_ves_seg-S_RA.yml")) as f:
    cfg = yaml.safe_load(f)

split = os.path.join(out_dir, "train_120.txt")
with open(split, "w") as f:
    f.write("\n".join(str(i) for i in range(120)) + "\n")

for side in cfg["Train"]["data"].values():
    side["split"] = split
cfg["Validation"]["data"]["image"]["split"] = "configs/splits/val_0.txt"
cfg["Validation"]["data"]["label"]["split"] = "configs/splits/val_0.txt"

# 304² everywhere: retarget the final train Resized and the val/test
# Resized from 1216² to 304²; RemoveSmallObjects scales with area (160 at
# 1216² -> 10 at 304²).
for phase in ("Train", "Validation"):
    for t in cfg[phase]["data_augmentation"]:
        if (t["name"] == "Resized" and "image" in t["keys"]
                and t["spatial_size"] == [1216, 1216]):
            t["spatial_size"] = [304, 304]
    for t in cfg[phase]["post_processing"]["prediction"]:
        if t["name"] == "RemoveSmallObjects":
            t["min_size"] = 10

cfg["Train"]["epochs_decay"] = 0
cfg["Train"]["val_interval"] = 1
cfg["Output"]["save_dir"] = os.path.join(out_dir, "trials")
cfg["Output"]["save_to_tensorboard"] = False

base = os.path.join(out_dir, "base.yml")
with open(base, "w") as f:
    yaml.dump(cfg, f, sort_keys=False)
print("wrote", base, "and", split)
