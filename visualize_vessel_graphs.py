#!/usr/bin/env python
"""Re-render stored vessel-graph CSVs as 2D images / 3D volumes
(reference-compatible CLI, ``/root/reference/visualize_vessel_graphs.py``).
"""
import argparse
import os
import pickle
from glob import glob

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="")
    parser.add_argument("--source_dir", type=str, required=True)
    parser.add_argument("--out_dir", type=str, required=True)
    parser.add_argument("--resolution", type=str, default="1216,1216,16")
    parser.add_argument("--binarize", action="store_true")
    parser.add_argument("--save_3d", action="store_true")
    parser.add_argument("--save_3d_as", type=str, default="npy")
    parser.add_argument("--mip_axis", type=int, default=2)
    parser.add_argument("--max_dropout_prob", type=float, default=0)
    parser.add_argument("--save_blackdict", action="store_true")
    parser.add_argument("--blackdict_dir", type=str, default=None)
    parser.add_argument("--ignore_z", action="store_true")
    parser.add_argument("--num_samples", type=int, default=None)
    args = parser.parse_args()

    from PIL import Image

    from octa_tpu.ops import raster

    os.makedirs(args.out_dir, exist_ok=True)
    resolution = [int(r) for r in args.resolution.split(",")]
    csvs = sorted(glob(os.path.join(args.source_dir, "**", "*.csv"),
                       recursive=True))
    if args.num_samples:
        csvs = csvs[: args.num_samples]
    assert csvs, f"No csv files found under {args.source_dir}"

    for path in csvs:
        name = os.path.splitext(os.path.basename(path))[0]
        arrays = raster.parse_graph_csv(path)
        blackdict = None
        if args.blackdict_dir:
            bd_path = os.path.join(args.blackdict_dir, name + "_blackdict.pkl")
            if os.path.exists(bd_path):
                with open(bd_path, "rb") as f:
                    blackdict = pickle.load(f)
        if args.save_3d:
            vol, blackdict = raster.voxelize_forest(
                arrays, resolution, max_dropout_prob=args.max_dropout_prob,
                blackdict=blackdict, ignore_z=args.ignore_z)
            if args.binarize:
                vol = ((vol / 255.0) > 0.1).astype(np.uint8) * 255
            np.save(os.path.join(args.out_dir, name + ".npy"),
                    vol.astype(np.uint8))
        else:
            image_res = [*resolution]
            if len(image_res) == 3:
                del image_res[args.mip_axis]
            img, blackdict = raster.rasterize_forest(
                arrays, image_res, args.mip_axis,
                max_dropout_prob=args.max_dropout_prob, blackdict=blackdict)
            if args.binarize:
                img = ((img / 255.0) > 0.1).astype(np.uint8) * 255
            Image.fromarray(img.astype(np.uint8)).save(
                os.path.join(args.out_dir, name + ".png"))
        if args.save_blackdict and blackdict:
            with open(os.path.join(args.out_dir, name + "_blackdict.pkl"),
                      "wb") as f:
                pickle.dump(blackdict, f)
        print(f"rendered {name}")


if __name__ == "__main__":
    main()
