#!/usr/bin/env python
"""Train a model from a YAML config (reference-compatible CLI,
``/root/reference/train.py:205-230``):

    python train.py --config_file configs/config_ves_seg-S.yml \
        [--start_epoch N] [--epoch latest] [--split 0] [--num_workers N] \
        [--Section.key value ...]
"""
import argparse
from random import randint

from octa_tpu.utils.config import apply_cli_overrides, load_config

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="")
    parser.add_argument("--config_file", type=str, required=True)
    parser.add_argument("--start_epoch", type=int, default=0)
    parser.add_argument("--epoch", type=str, default="latest")
    parser.add_argument("--split", type=str, default="")
    parser.add_argument("--save_latest", type=bool, default=True)
    parser.add_argument("--num_workers", type=int, default=None)
    parser.add_argument(
        "--epochs_per_run", type=int, default=0,
        help="exit cleanly after this many epochs (0 = unlimited) so a "
             "launcher can restart the process and resume — bounds the "
             "axon client's per-transfer host-memory leak")
    parser.add_argument(
        "--profile", action="store_true",
        help="capture a jax.profiler trace of the first epochs into the run "
             "dir (view with TensorBoard or xprof)")
    parser.add_argument(
        "--debug", action="store_true",
        help="fail fast on numerical anomalies: jax_debug_nans + warnings "
             "promoted to errors (the analogue of the reference's "
             "set_detect_anomaly / --debug modes)")
    args, unknown = parser.parse_known_args()

    config = load_config(args.config_file)
    apply_cli_overrides(config, unknown)
    if "seed" not in config["General"]:
        config["General"]["seed"] = randint(0, int(1e6))

    if args.debug:
        import warnings

        import jax

        warnings.filterwarnings("error")
        jax.config.update("jax_debug_nans", True)

    from octa_tpu.train.engine import train

    if args.profile:
        import os

        import jax

        trace_dir = os.path.join(
            config.get("Output", {}).get("save_dir", "./results"),
            "profile_trace")
        with jax.profiler.trace(trace_dir):
            run_dir = train(args, config)
        print(f"Profiler trace written to {trace_dir}")
    else:
        train(args, config)
