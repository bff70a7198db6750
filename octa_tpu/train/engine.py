"""Training engine — the epoch loop of the reference's ``train.py:29-203``
(checkpoint tags, best-metric tracking on Validation DSC, val_interval /
save_interval semantics, metrics.csv + sample plots), driving the jitted
algorithm step functions.
"""
from __future__ import annotations

import datetime
import time
from shutil import copyfile

import numpy as np

from octa_tpu.data.dataset import get_dataset, get_post_transformation
from octa_tpu.io.visualizer import Visualizer
from octa_tpu.train.algorithms import define_model
from octa_tpu.utils.enums import Phase
from octa_tpu.utils.metrics import MetricsManager, _is_zstack


def apply_split_suffix(config: dict, split: str):
    """Reference ``train.py:31-37``: append the split id to split-file stems."""
    for phase in Phase:
        if phase not in config:
            continue
        for k in config[phase].get("data", {}):
            entry = config[phase]["data"][k]
            if not entry.get("split", ".txt").endswith(".txt"):
                assert split, "You have to specify a split!"
                entry["split"] = entry["split"] + split + ".txt"


class _LiveProgress:
    """Rich live console for training (reference ``train.py:78-105,229``:
    epoch + batch progress bars with the running loss, inside a
    ``rich.live.Live``). Active only on a TTY (or OCTA_TPU_RICH=1) so
    recipe-launcher logs and piped runs keep the plain one-line-per-epoch
    output; OCTA_TPU_RICH=0 forces it off."""

    def __init__(self, n_epochs: int, start_epoch: int):
        import os
        import sys

        flag = os.environ.get("OCTA_TPU_RICH")
        self.on = (flag != "0") and (flag == "1" or sys.stdout.isatty())
        if not self.on:
            return
        from rich.live import Live
        from rich.progress import Progress, TimeElapsedColumn

        self.progress = Progress(*Progress.get_default_columns(),
                                 TimeElapsedColumn(),
                                 speed_estimate_period=300)
        self.live = Live(self.progress, refresh_per_second=4)
        self.live.start()
        self.epoch_task = self.progress.add_task(
            "Epochs", total=n_epochs - start_epoch)
        self.batch_task = None

    def epoch_start(self, n_batches):
        if not self.on:
            return
        if self.batch_task is not None:
            self.progress.remove_task(self.batch_task)
        self.batch_task = self.progress.add_task("Train Batch",
                                                 total=n_batches)

    def batch(self, loss_name, value):
        if self.on and self.batch_task is not None:
            self.progress.update(
                self.batch_task, advance=1,
                description=f"train {loss_name}: {value:.4f}")

    def epoch_end(self):
        if self.on:
            self.progress.advance(self.epoch_task)

    def close(self):
        if self.on:
            self.live.stop()


def train(args, config: dict):
    apply_split_suffix(config, getattr(args, "split", ""))

    max_epochs = config[Phase.TRAIN]["epochs"]
    val_interval = config[Phase.TRAIN].get("val_interval") or 1
    save_interval = config[Phase.TRAIN].get("save_interval") or 100
    visualizer = Visualizer(config, getattr(args, "start_epoch", 0) > 0,
                            epoch=getattr(args, "epoch", "latest"))

    train_loader = get_dataset(config, Phase.TRAIN)
    post_train = get_post_transformation(config, Phase.TRAIN)
    if Phase.VALIDATION in config:
        val_loader = get_dataset(config, Phase.VALIDATION)
        post_val = get_post_transformation(config, Phase.VALIDATION)
    else:
        val_loader = None
        print("No validation config. Skipping validation steps.")

    init_mini_batch = next(iter(train_loader))
    input_key = [k for k in init_mini_batch if not k.endswith("_path")][0]
    init_mini_batch.setdefault("image", init_mini_batch[input_key])

    model = define_model(config, Phase.TRAIN)
    model.initialize_model_and_optimizer(init_mini_batch, config, args,
                                         phase=Phase.TRAIN)
    visualizer.save_model_architecture(model)

    metrics = MetricsManager(phase=Phase.TRAIN)

    if getattr(args, "start_epoch", 0) > 0:
        best_metric, best_metric_epoch = visualizer.get_max_of_metric(
            "metric", metrics.get_comp_metric(Phase.VALIDATION))
    else:
        best_metric, best_metric_epoch = -1, -1

    total_start = time.time()
    train_sample_path = val_sample_path = None
    live = _LiveProgress(max_epochs, getattr(args, "start_epoch", 0))
    for epoch in range(getattr(args, "start_epoch", 0), max_epochs):
        epoch_metrics: dict[str, dict[str, float]] = {"loss": {}}
        model.train()
        epoch_loss, step, save_best = 0.0, 0, False
        t_ep = time.time()
        live.epoch_start(len(train_loader))
        for mini_batch in train_loader:
            step += 1
            outputs, losses = model.perform_training_step(mini_batch, post_train)
            model.compute_metric(outputs, metrics)
            for loss_name, loss in losses.items():
                key = f"train_{loss_name}"
                epoch_metrics["loss"][key] = (
                    epoch_metrics["loss"].get(key, 0.0) + loss)
            main_loss = list(losses)[0]
            epoch_loss += losses[main_loss]
            live.batch(main_loss, float(losses[main_loss]))
        model.scheduler_step(epoch)
        epoch_metrics["loss"] = {
            k: v / step for k, v in epoch_metrics["loss"].items()}
        epoch_metrics["metric"] = metrics.aggregate_and_reset(
            prefix=str(Phase.TRAIN))
        epoch_loss /= step

        if getattr(args, "save_latest", True) or (epoch + 1) % save_interval == 0:
            train_sample_path = model.plot_sample(
                visualizer, mini_batch, outputs, suffix="train_latest")

        # VALIDATION
        if val_loader is not None and (epoch + 1) % val_interval == 0:
            model.eval()
            val_metrics = MetricsManager(phase=Phase.VALIDATION,
                                         volumetric=_is_zstack(config))
            val_loss, vstep = 0.0, 0
            for val_mini_batch in val_loader:
                vstep += 1
                outputs, losses = model.inference(
                    val_mini_batch, post_val, phase=Phase.VALIDATION)
                model.compute_metric(outputs, val_metrics)
                for loss_name, loss in losses.items():
                    key = f"val_{loss_name}"
                    epoch_metrics["loss"][key] = (
                        epoch_metrics["loss"].get(key, 0.0) + float(loss))
                val_loss += float(losses[list(losses)[0]])
            epoch_metrics["loss"] = {
                k: (v / vstep if k.startswith("val_") else v)
                for k, v in epoch_metrics["loss"].items()}
            epoch_metrics["metric"].update(
                val_metrics.aggregate_and_reset(prefix=str(Phase.VALIDATION)))
            metric_comp = epoch_metrics["metric"][
                val_metrics.get_comp_metric(Phase.VALIDATION)]
            if metric_comp > best_metric:
                best_metric, best_metric_epoch = metric_comp, epoch
                save_best = True
            if getattr(args, "save_latest", True) or save_best \
                    or (epoch + 1) % save_interval == 0:
                val_sample_path = model.plot_sample(
                    visualizer, val_mini_batch, outputs, suffix="val_latest")

        if visualizer.save_to_disk:
            if (epoch + 1) % save_interval == 0 and train_sample_path:
                copyfile(train_sample_path,
                         train_sample_path.replace("latest", str(epoch + 1)))
            if save_best and train_sample_path and val_sample_path:
                copyfile(train_sample_path,
                         train_sample_path.replace("latest", "best"))
                copyfile(val_sample_path,
                         val_sample_path.replace("latest", "best"))

        # Checkpoints (reference tag scheme)
        if visualizer.save_to_disk and (
                getattr(args, "save_latest", True) or save_best
                or (epoch + 1) % save_interval == 0):
            for optimizer_name in model.optimizer_mapping:
                p = visualizer.save_model(
                    None, model.optimizer_state(optimizer_name), epoch + 1,
                    config, f"latest_{optimizer_name}")
                if (epoch + 1) % save_interval == 0:
                    copyfile(p, p.replace("latest", str(epoch + 1)))
                if save_best:
                    copyfile(p, p.replace("latest", "best"))
            for net_names in model.optimizer_mapping.values():
                for net_name in net_names:
                    p = visualizer.save_model(
                        model.network_state(net_name), None, epoch + 1,
                        config, f"latest_{net_name}")
                    if (epoch + 1) % save_interval == 0:
                        copyfile(p, p.replace("latest", str(epoch + 1)))
                    if save_best:
                        copyfile(p, p.replace("latest", "best"))

        visualizer.plot_losses_and_metrics(epoch_metrics, epoch)
        live.epoch_end()
        msg = ", ".join(f"{k}={v:.4f}" for k, v in
                        list(epoch_metrics["loss"].items())[:4])
        print(f"[epoch {epoch + 1}/{max_epochs}] {msg} "
              f"({time.time() - t_ep:.1f}s)", flush=True)

        # Bounded-lifetime training: exit cleanly after N epochs so an
        # external launcher can restart the process and resume. The axon
        # TPU client leaks host memory per transfer (~11 GB/epoch at batch
        # 4, 1216² — an 11-epoch run OOM-killed a 125 GB host), and a clean
        # exit at an epoch boundary avoids the wedged-tunnel state that
        # mid-run kills cause.
        per_run = int(getattr(args, "epochs_per_run", 0) or 0)
        if per_run and (epoch + 1 - getattr(args, "start_epoch", 0)) >= per_run \
                and (epoch + 1) < max_epochs:
            print(f"epochs_per_run={per_run} reached at epoch {epoch + 1}; "
                  "exiting for clean resume.", flush=True)
            break

    live.close()
    total = time.time() - total_start
    print(f"Finished training after {datetime.timedelta(seconds=total)}.")
    if best_metric_epoch > -1:
        print(f"Best metric: {best_metric} at epoch: {best_metric_epoch}.")
    return visualizer.save_dir
