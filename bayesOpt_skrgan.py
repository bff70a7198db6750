#!/usr/bin/env python
"""SkrGAN sketch-filter parameter search (reference
``utils/bayesOpt_skrgan.py``): tune sigma / area thresholds / binarization
threshold against Validation DSC."""
import argparse

import numpy as np

from octa_tpu.utils.config import apply_cli_overrides, load_config

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="")
    parser.add_argument("--config_file", type=str, required=True)
    parser.add_argument("--num_samples", type=int, default=50)
    args, unknown = parser.parse_known_args()

    config = load_config(args.config_file)
    apply_cli_overrides(config, unknown)
    config.setdefault("General", {}).setdefault("seed", 4958)

    from octa_tpu.data.dataset import get_dataset
    from octa_tpu.ops.filters import skrgan_sketch
    from octa_tpu.utils.enums import Phase
    from octa_tpu.utils.hpo import Uniform, UniformInt, tune
    from octa_tpu.utils.metrics import MetricsManager

    config[Phase.VALIDATION]["batch_size"] = 1
    loader = get_dataset(config, Phase.VALIDATION)
    samples = [(np.asarray(b["image"])[0], np.asarray(b["label"])[0])
               for b in loader]

    def eval_fn(params):
        metrics = MetricsManager(Phase.TRAIN)
        for img, label in samples:
            sketch = skrgan_sketch(
                img, sigma=params["sigma"],
                area_threshold_open=params["area_threshold_open"],
                area_threshold_close=params["area_threshold_close"])
            pred = (sketch > params["threshold"]).astype(np.float32)
            metrics([pred[None]], [(label > 0.5).astype(np.uint8)])
        return metrics.aggregate_and_reset(str(Phase.VALIDATION))

    space = {
        "area_threshold_open": UniformInt(1, 96),
        "area_threshold_close": UniformInt(1, 96),
        "sigma": UniformInt(0, 5),
        "threshold": Uniform(0.5, 0.9),
    }
    best_params, best_result, _ = tune(
        space, eval_fn, metric="Validation_DSC", mode="max",
        num_samples=args.num_samples)
    print("Best trial:", best_params, best_result)
