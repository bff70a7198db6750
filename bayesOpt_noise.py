#!/usr/bin/env python
"""Noise-model hyper-parameter search (reference ``utils/bayesOpt_noise.py``):
tune lambda_speckle / lambda_delta / max_decrease_res by running short
trainings and scoring Validation DSC. Uses the lightweight HPO harness.

The config must contain a NoiseModeld entry in Train.data_augmentation and a
RandomDecreaseResolutiond entry (the tuned values are injected into them).
"""
import argparse
import copy

import numpy as np

from octa_tpu.utils.config import apply_cli_overrides, load_config

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="")
    parser.add_argument("--config_file", type=str, required=True)
    parser.add_argument("--num_samples", type=int, default=32)
    parser.add_argument("--epochs_per_trial", type=int, default=2)
    args, unknown = parser.parse_known_args()

    base = load_config(args.config_file)
    apply_cli_overrides(base, unknown)
    base.setdefault("General", {}).setdefault("seed", 4958)

    from octa_tpu.train.engine import train
    from octa_tpu.utils.enums import Phase
    from octa_tpu.utils.hpo import Choice, tune

    def _inject(config, params):
        for aug in config[Phase.TRAIN]["data_augmentation"]:
            if aug["name"] == "NoiseModeld":
                aug["lambda_speckle"] = params["lambda_speckle"]
                aug["lambda_delta"] = params["lambda_delta"]
            if aug["name"] == "RandomDecreaseResolutiond":
                aug["max_factor"] = params["max_decrease_res"]

    def eval_fn(params):
        config = copy.deepcopy(base)
        _inject(config, params)
        config[Phase.TRAIN]["epochs"] = args.epochs_per_trial
        config["Output"]["save_to_disk"] = True

        class A:
            start_epoch = 0
            epoch = "latest"
            split = ""
            save_latest = True
            num_workers = 0

        out_dir = train(A(), config)
        import csv
        import os

        with open(os.path.join(out_dir, "metrics.csv")) as f:
            rows = list(csv.DictReader(f))
        return {"Validation_DSC": float(rows[-1].get("Validation_DSC", 0))}

    space = {
        "lambda_speckle": Choice(list(np.arange(0.3, 0.71, 0.1))),
        "lambda_delta": Choice(list(np.arange(0.5, 1.1, 0.1))),
        "max_decrease_res": Choice(list(np.arange(0.3, 1.1, 0.1))),
    }
    best_params, best_result, _ = tune(
        space, eval_fn, metric="Validation_DSC", mode="max",
        num_samples=args.num_samples)
    print("Best trial:", best_params, best_result)
