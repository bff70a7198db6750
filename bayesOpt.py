#!/usr/bin/env python
"""Post-processing hyper-parameter search (reference ``utils/bayesOpt.py``):
optimize the prediction threshold and RemoveSmallObjects min_size against
Validation DSC. Runs the lightweight HPO harness instead of Ray/BOHB.

    python bayesOpt.py --config_file <cfg.yml> [--num_samples 100]
"""
import argparse
import copy

from octa_tpu.utils.config import apply_cli_overrides, load_config

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="")
    parser.add_argument("--config_file", type=str, required=True)
    parser.add_argument("--num_samples", type=int, default=100)
    parser.add_argument("--epoch", type=str, default="best")
    parser.add_argument("--debug_mode", action="store_true")
    args, unknown = parser.parse_known_args()

    config = load_config(args.config_file)
    apply_cli_overrides(config, unknown)
    config.setdefault("General", {}).setdefault("seed", 4958)

    import numpy as np

    from octa_tpu.data.dataset import get_dataset, get_post_transformation
    from octa_tpu.train.algorithms import define_model
    from octa_tpu.utils.enums import Phase
    from octa_tpu.utils.hpo import Choice, UniformInt, tune
    from octa_tpu.utils.metrics import MetricsManager

    config[Phase.VALIDATION]["batch_size"] = 1
    loader = get_dataset(config, Phase.VALIDATION)
    model = define_model(config, Phase.VALIDATION)
    init_batch = next(iter(loader))
    model.initialize_model_and_optimizer(init_batch, config, args,
                                         phase=Phase.VALIDATION)

    # cache raw predictions once; the search only re-runs post-processing
    raw = []
    for mini_batch in loader:
        outputs, _ = model.inference(
            mini_batch, {"prediction": None, "label": None},
            phase=Phase.VALIDATION)
        raw.append((np.asarray(outputs["prediction"][0]),
                    np.asarray(outputs["label"][0])))

    from octa_tpu.data.transforms import (
        Activations,
        AsDiscrete,
        CastToType,
        Compose,
        RemoveSmallObjects,
    )

    def eval_fn(params):
        post = Compose([
            Activations(sigmoid=True),
            AsDiscrete(threshold=params["threshold"]),
            RemoveSmallObjects(min_size=params["min_size"]),
        ])
        post_label = CastToType(dtype="uint8")
        metrics = MetricsManager(Phase.TRAIN)  # DSC + IoU is enough
        for pred, label in raw:
            metrics([np.asarray(post(pred))], [post_label(label)])
        return metrics.aggregate_and_reset(str(Phase.VALIDATION))

    space = {
        "min_size": UniformInt(0, 64),
        "threshold": Choice(list(np.arange(0.01, 0.9, 0.01))),
    }
    best_params, best_result, _ = tune(
        space, eval_fn, metric="Validation_DSC", mode="max",
        num_samples=args.num_samples)
    print("Best trial:", best_params, best_result)
