#!/usr/bin/env python
"""Run the Validation split through a trained model and print the metric dict
(reference ``validate.py:21-70``; batch size forced to 1)."""
import argparse

from octa_tpu.utils.config import apply_cli_overrides, load_config

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="")
    parser.add_argument("--config_file", type=str, required=True)
    parser.add_argument("--epoch", type=str, default="best")
    parser.add_argument("--split", type=str, default="")
    args, unknown = parser.parse_known_args()

    config = load_config(args.config_file)
    apply_cli_overrides(config, unknown)
    config.setdefault("General", {}).setdefault("seed", 4958)

    from octa_tpu.data.dataset import get_dataset, get_post_transformation
    from octa_tpu.train.algorithms import define_model
    from octa_tpu.train.engine import apply_split_suffix
    from octa_tpu.utils.enums import Phase
    from octa_tpu.utils.metrics import MetricsManager, _is_zstack

    apply_split_suffix(config, args.split)
    config[Phase.VALIDATION]["batch_size"] = 1
    loader = get_dataset(config, Phase.VALIDATION)
    post = get_post_transformation(config, Phase.VALIDATION)

    model = define_model(config, Phase.VALIDATION)
    init_batch = next(iter(loader))
    model.initialize_model_and_optimizer(init_batch, config, args,
                                         phase=Phase.VALIDATION)
    metrics = MetricsManager(Phase.VALIDATION,
                             volumetric=_is_zstack(config))
    for mini_batch in loader:
        outputs, _ = model.inference(mini_batch, post, phase=Phase.VALIDATION)
        model.compute_metric(outputs, metrics)
    result = metrics.aggregate_and_reset(str(Phase.VALIDATION))
    print({k: round(v, 4) for k, v in result.items()})
