#!/usr/bin/env python
"""Example: full retraining recipe on a new dataset (equivalent of the
reference's example_train_gan-seg_with_new_dataset.ipynb):

1. generate synthetic vessel graphs,
2. train the joint GAN+segmentation model (S-GAN),
3. validate the segmentor and run test-time inference.

Point IMAGES_GLOB at your real OCTA images (grayscale PNG). Defaults use the
bundled dataset so the script runs out of the box (tiny settings — raise
epochs/resolutions for real runs).
"""
import copy
import os

import yaml

IMAGES_GLOB = os.environ.get("IMAGES_GLOB", "datasets/images/*.png")
OUT = os.environ.get("OUT_DIR", "./results/example_gan_seg")
QUICK = os.environ.get("QUICK", "1") == "1"


class Args:
    start_epoch = 0
    epoch = "latest"
    split = ""
    save_latest = True
    num_workers = 0


def main():
    # --- step 1: generate vessel graphs ---
    os.system(
        "python generate_vessel_graph.py --config_file "
        "configs/vessel_graph_gen.yml --num_samples 4 "
        f"--output.directory {OUT}/graphs"
        + (" --Greenhouse.modes 'null'" if False else ""))

    # --- step 2: joint GAN + segmentation training ---
    with open("configs/config_gan_ves_seg.yml") as f:
        config = yaml.safe_load(f)
    config["Train"]["data"]["real_B"]["files"] = IMAGES_GLOB
    config["Output"]["save_dir"] = f"{OUT}/gan_seg"
    if QUICK:
        config["Train"]["epochs"] = 1
        config["Train"]["batch_size"] = 2
        config["General"]["model"]["upshape"] = [304, 304]
        aug = config["Train"]["data_augmentation"]
        for t in aug:
            if t["name"] == "LoadGraphAndFilterByRandomRadiusd":
                t["image_resolutions"] = [[128, 128], [304, 304]]
            if t["name"] == "Resized":
                t["spatial_size"] = [128, 128]

    from octa_tpu.train.engine import train

    run_dir = train(Args(), config)
    print("GAN+seg run:", run_dir)

    # --- step 3: inference with the trained generator ---
    os.system(
        f"python test.py --config_file {run_dir}/config.yml "
        f"--General.inference G --epoch latest --num_samples 2 "
        f"--Test.save_dir {OUT}/fake_octa")
    print("done; artifacts under", OUT)


if __name__ == "__main__":
    main()
