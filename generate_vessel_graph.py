#!/usr/bin/env python
"""Generate synthetic vessel graphs (reference-compatible CLI,
``/root/reference/generate_vessel_graph.py:91-134``).

TPU-native difference: instead of a process pool running one simulation per
CPU core, all ``--num_samples`` simulations grow **batched on the
accelerator** in one vmapped, jit-compiled program.
"""
import argparse
import datetime
import os
import uuid

import numpy as np

from octa_tpu.utils.config import apply_cli_overrides, load_config


def prepare_output_dir(out_cfg: dict) -> str:
    stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    out = os.path.join(out_cfg["directory"], f"{stamp}_{uuid.uuid4().hex[:8]}")
    os.makedirs(out, exist_ok=True)
    return out


def main():
    parser = argparse.ArgumentParser(description="")
    parser.add_argument("--config_file", type=str, required=True)
    parser.add_argument("--num_samples", type=int, default=1)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--threads", type=int, default=-1,
                        help="kept for CLI parity; batching replaces it")
    parser.add_argument("--batch_size", type=int, default=None,
                        help="simulations grown per device batch")
    parser.add_argument("--seed", type=int, default=0)
    args, unknown = parser.parse_known_args()

    if args.debug:
        import warnings

        warnings.filterwarnings("error")

    config = load_config(args.config_file)
    apply_cli_overrides(config, unknown)
    assert config["output"].get("save_3D_volumes") in [None, "npy", "nifti"], (
        f"Invalid save_3D_volumes option "
        f"{config['output'].get('save_3D_volumes')}")

    import yaml

    from octa_tpu.ops import raster
    from octa_tpu.sim import greenhouse as gh

    g = gh.Greenhouse(config["Greenhouse"], seed=args.seed)
    # per-iteration cost is largely batch-independent on TPU (measured
    # 27.4s at batch 8 vs 25.8s at batch 128 for the docker schedule), so
    # grow as many simulations per program as memory allows
    batch = args.batch_size or min(args.num_samples, 64)

    # Multi-chip: shard the simulation batch over a `data` mesh spanning
    # all local devices (SURVEY §2.9 — the v5e-8 "500 samples < 2 min"
    # scaling path). The sims are independent, so XLA partitions the
    # vmapped program with no collectives; develop_forest pads the batch
    # to a mesh multiple internally.
    import jax

    mesh = None
    if jax.device_count() > 1:
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()), ("data",))
        print(f"growth sharded over {jax.device_count()} devices")

    collect_stats = bool(config["output"].get("save_stats"))
    done = 0
    while done < args.num_samples:
        b = min(batch, args.num_samples - done)
        g.seed = args.seed + done
        out = g.develop_forest(config["Forest"], batch=b,
                               collect_stats=collect_stats, mesh=mesh)
        state, stats = out if collect_stats else (out, None)
        for i in range(b):
            out_dir = prepare_output_dir(config["output"])
            with open(os.path.join(out_dir, "config.yml"), "w") as f:
                yaml.safe_dump(config, f)
            art = gh.forest_to_edges(state.art, i)
            ven = gh.forest_to_edges(state.ven, i)
            name = out_dir.split("/")[-1]

            if config["output"].get("save_trees"):
                gh.save_edges_csv([art, ven],
                                  os.path.join(out_dir, name + ".csv"))

            if collect_stats:
                g.save_stats(state, stats, os.path.join(out_dir, "stats"),
                             sim_index=i)

            scale = config["output"]["image_scale_factor"]
            volume_dimension = [int(d * scale) for d in g.sizes]

            if config["output"].get("save_3D_volumes"):
                art_mat, _ = raster.voxelize_forest(art, volume_dimension)
                ven_mat, _ = raster.voxelize_forest(ven, volume_dimension)
                vol = np.maximum(art_mat, ven_mat).astype(np.uint8)
                if config["output"]["save_3D_volumes"] == "npy":
                    np.save(f"{out_dir}/art_ven_img_gray.npy", vol)
                else:
                    np.save(f"{out_dir}/art_ven_img_gray.nii.npy", vol)

            if config["output"].get("save_2D_image"):
                image_res = [*volume_dimension]
                del image_res[config["output"]["proj_axis"]]
                art_mat, _ = raster.rasterize_forest(
                    art, image_res, MIP_axis=config["output"]["proj_axis"])
                ven_mat, _ = raster.rasterize_forest(
                    ven, image_res, MIP_axis=config["output"]["proj_axis"])
                img = np.maximum(art_mat, ven_mat).astype(np.uint8)
                from PIL import Image

                Image.fromarray(img).save(
                    f"{out_dir}/art_ven_img_gray.png")
            done += 1
            print(f"[{done}/{args.num_samples}] {out_dir}")


if __name__ == "__main__":
    main()
