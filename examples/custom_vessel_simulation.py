#!/usr/bin/env python
"""Example: customize the vessel simulation and render the result
(equivalent of the reference's example_custom_vessel_simulation.ipynb).

Edits the simulation config in code, grows a small batch of samples on the
accelerator, and renders images + labels.
"""
import os

import numpy as np
import yaml

from octa_tpu.ops import raster
from octa_tpu.sim import greenhouse as gh

OUT = os.environ.get("OUT_DIR", "./results/example_sim")


def main():
    with open("configs/vessel_graph_gen.yml") as f:
        config = yaml.safe_load(f)

    # --- customize the simulation ---
    # fewer iterations for a quick demo; denser trees; narrower FAZ
    config["Greenhouse"]["modes"][0]["I"] = 40
    config["Greenhouse"]["modes"][1]["I"] = 20
    config["Greenhouse"]["FAZ_radius_bound"] = [0.35, 0.02]
    config["Forest"]["N_trees"] = 8

    g = gh.Greenhouse(config["Greenhouse"], seed=7)
    state = g.develop_forest(config["Forest"], batch=2)

    os.makedirs(OUT, exist_ok=True)
    from PIL import Image

    for i in range(2):
        art = gh.forest_to_edges(state.art, i)
        ven = gh.forest_to_edges(state.ven, i)
        gh.save_edges_csv([art, ven], f"{OUT}/sample_{i}.csv")
        arrays = raster.parse_graph_csv(f"{OUT}/sample_{i}.csv")
        img, _ = raster.rasterize_forest(arrays, [304, 304], 2)
        lab, _ = raster.rasterize_forest(arrays, [1216, 1216], 2)
        Image.fromarray(img.astype(np.uint8)).save(f"{OUT}/sample_{i}.png")
        Image.fromarray(((lab / 255.0 > 0.1) * 255).astype(np.uint8)).save(
            f"{OUT}/sample_{i}_label.png")
        print(f"sample {i}: {len(arrays['radius'])} edges -> {OUT}")


if __name__ == "__main__":
    main()
