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


def _inject(config, params):
    from octa_tpu.utils.enums import Phase

    for aug in config[Phase.TRAIN]["data_augmentation"]:
        if aug["name"] == "NoiseModeld":
            aug["lambda_speckle"] = params["lambda_speckle"]
            aug["lambda_delta"] = params["lambda_delta"]
        if aug["name"] == "RandomDecreaseResolutiond":
            aug["max_factor"] = params["max_decrease_res"]


def make_eval_fn(base: dict, epochs_per_trial: int):
    """Build the successive-halving rung evaluator: train to ``budget *
    epochs_per_trial`` epochs, resuming from the previous rung's run dir
    when promoted (reference: BOHB early-stops bad trials the same way,
    ``utils/bayesOpt.py:76-115``)."""
    import csv
    import os

    from octa_tpu.train.engine import train
    from octa_tpu.utils.enums import Phase

    trial_counter = [0]

    def eval_fn(params, budget, state):
        config = copy.deepcopy(base)
        _inject(config, params)
        epochs = budget * epochs_per_trial
        config[Phase.TRAIN]["epochs"] = epochs
        config["Output"]["save_to_disk"] = True
        if state is None:
            trial_counter[0] += 1
            config["Output"]["save_dir"] = os.path.join(
                base["Output"]["save_dir"], f"trial_{trial_counter[0]}")
        else:
            # resume-from-run-dir semantics (same as the recipe launchers):
            # train() nests each run in a timestamped subdir and returns
            # it; on promoted rungs Output.save_dir must point AT that run
            # dir — the Visualizer resume fork and the checkpoint loader
            # both read `<save_dir>/checkpoints/latest_*` from it
            config["Output"]["save_dir"] = state["trial_dir"]

        class A:
            start_epoch = 0 if state is None else state["epochs_done"]
            epoch = "latest"
            split = ""
            save_latest = True
            num_workers = 0

        out_dir = train(A(), config)
        with open(os.path.join(out_dir, "metrics.csv")) as f:
            rows = list(csv.DictReader(f))
        return {"Validation_DSC": float(rows[-1].get("Validation_DSC", 0)),
                "trial_dir": out_dir, "epochs_done": epochs}

    return eval_fn


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="")
    parser.add_argument("--config_file", type=str, required=True)
    parser.add_argument("--num_samples", type=int, default=32)
    parser.add_argument("--epochs_per_trial", type=int, default=2)
    parser.add_argument("--max_budget", type=int, default=9,
                        help="successive-halving max budget multiplier "
                             "(epochs = budget * epochs_per_trial)")
    parser.add_argument("--sampler", type=str, default="tpe",
                        choices=["tpe", "random"],
                        help="tpe = surrogate-model sampling (BOHB-style), "
                             "random = quasi-random")
    args, unknown = parser.parse_known_args()

    base = load_config(args.config_file)
    apply_cli_overrides(base, unknown)
    base.setdefault("General", {}).setdefault("seed", 4958)

    from octa_tpu.utils.hpo import Choice, tune_sha

    space = {
        "lambda_speckle": Choice([round(float(x), 2)
                                  for x in np.arange(0.3, 0.71, 0.1)]),
        "lambda_delta": Choice([round(float(x), 2)
                                for x in np.arange(0.5, 1.1, 0.1)]),
        "max_decrease_res": Choice([round(float(x), 2)
                                    for x in np.arange(0.3, 1.1, 0.1)]),
    }
    best_params, best_result, _ = tune_sha(
        space, make_eval_fn(base, args.epochs_per_trial),
        metric="Validation_DSC", mode="max",
        num_samples=args.num_samples, min_budget=1,
        max_budget=args.max_budget, reduction_factor=3,
        sampler=args.sampler)
    print("Best trial:", best_params, best_result)
