#!/usr/bin/env python
"""Inference-only: write one prediction image per test sample, named
``{inference_mode}_{input_name}`` (reference ``test.py:21-90``)."""
import argparse
import os

from octa_tpu.utils.config import apply_cli_overrides, load_config

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="")
    parser.add_argument("--config_file", type=str, required=True)
    parser.add_argument("--epoch", type=str, default="best")
    parser.add_argument("--num_samples", type=int, default=None)
    args, unknown = parser.parse_known_args()

    config = load_config(args.config_file)
    apply_cli_overrides(config, unknown)
    config.setdefault("General", {}).setdefault("seed", 4958)

    import numpy as np

    from octa_tpu.data.dataset import get_dataset, get_post_transformation
    from octa_tpu.io.visualizer import plot_comparison, plot_single_image
    from octa_tpu.train.algorithms import define_model
    from octa_tpu.utils.enums import Phase

    save_dir = (config[Phase.TEST].get("save_dir")
                or os.path.join(config["Output"]["save_dir"], "test"))
    os.makedirs(save_dir, exist_ok=True)

    loader = get_dataset(config, Phase.TEST)
    post = get_post_transformation(config, Phase.TEST)

    model = define_model(config, Phase.TEST)
    init_batch = next(iter(loader))
    input_key = [k for k in init_batch if not k.endswith("_path")][0]
    init_batch.setdefault("image", init_batch[input_key])
    model.initialize_model_and_optimizer(init_batch, config, args,
                                         phase=Phase.TEST)
    inference_mode = config["General"].get("inference") or "model"

    num = 0
    for mini_batch in loader:
        input_key = [k for k in mini_batch if not k.endswith("_path")][0]
        mini_batch["image"] = mini_batch[input_key]
        outputs, _ = model.inference(mini_batch, post, phase=Phase.TEST)
        img_name = os.path.basename(
            str(mini_batch.get(input_key + "_path", ["pred"])[0]))
        img_name = os.path.splitext(img_name)[0] + ".png"
        plot_single_image(save_dir, np.asarray(outputs["prediction"][0]),
                          f"{inference_mode}_{img_name}")
        if config[Phase.TEST].get("save_comparisons"):
            # side-by-side input/prediction next to the prediction
            # (reference test.py:88-89)
            plot_comparison(
                save_dir, np.asarray(mini_batch[input_key][0]),
                np.asarray(outputs["prediction"][0]),
                f"comparison_{inference_mode}_{img_name}",
                path=mini_batch.get(input_key + "_path", [""])[0])
        num += 1
        if args.num_samples is not None and num >= args.num_samples:
            break
    print(f"Wrote {num} predictions to {save_dir}")
