"""Run-artifact management (reference ``utils/visualizer.py:17-296``).

Owns: timestamped run directory, config snapshot, append-only metrics.csv,
loss.png, checkpoint files with the {latest|best|<epoch>}_{name} tag scheme,
sample plots (seg grid / GAN-seg 2x3 grid), architecture.txt with parameter
counts, and single-prediction PNG/NIfTI-ish writers.
"""
from __future__ import annotations

import csv
import datetime
import os
import shutil
from typing import Any

import numpy as np
import yaml


class Visualizer:
    def __init__(self, config: dict, continue_train: bool = False,
                 epoch: str = "latest"):
        self.config = config
        self.save_to_disk = bool(config.get("Output", {}).get("save_to_disk"))
        base = config.get("Output", {}).get("save_dir", "./results")
        stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
        if continue_train:
            # reference resume semantics (``visualizer.py:38-58``): fork a
            # NEW sibling run dir, carry the checkpoints over and truncate
            # the metrics log to the resume epoch, so the original run stays
            # intact and the new one continues seamlessly.
            old_dir = base
            self.save_dir = os.path.join(os.path.dirname(base.rstrip("/"))
                                         or ".", stamp)
            if self.save_to_disk:
                os.makedirs(os.path.join(self.save_dir, "checkpoints"),
                            exist_ok=True)
                old_ck = os.path.join(old_dir, "checkpoints")
                if os.path.isdir(old_ck):
                    for fn in os.listdir(old_ck):
                        shutil.copyfile(os.path.join(old_ck, fn),
                                        os.path.join(self.save_dir,
                                                     "checkpoints", fn))
        else:
            self.save_dir = os.path.join(base, stamp)
        if self.save_to_disk:
            os.makedirs(self.save_dir, exist_ok=True)
            os.makedirs(os.path.join(self.save_dir, "checkpoints"), exist_ok=True)
            snapshot = dict(config)
            snapshot.setdefault("Output", {})
            snapshot["Output"] = dict(snapshot["Output"])
            snapshot["Output"]["save_dir"] = self.save_dir
            with open(os.path.join(self.save_dir, "config.yml"), "w") as f:
                yaml.safe_dump(_plain(snapshot), f, sort_keys=False)
        self.metrics_path = os.path.join(self.save_dir, "metrics.csv")
        self._metric_history: dict[str, list[float]] = {}
        if continue_train and self.save_to_disk:
            old_metrics = os.path.join(base, "metrics.csv")
            if os.path.exists(old_metrics):
                self._copy_truncated_metrics(old_metrics, epoch)
        self.save_to_tensorboard = bool(
            config.get("Output", {}).get("save_to_tensorboard"))
        self._tb = None

    def _tb_writer(self):
        """Lazy TensorBoard SummaryWriter (reference ``visualizer.py:160-164``
        writes scalars/graph/histograms when Output.save_to_tensorboard)."""
        if not (self.save_to_tensorboard and self.save_to_disk):
            return None
        if self._tb is None:
            try:
                from torch.utils.tensorboard import SummaryWriter
            except Exception:
                self.save_to_tensorboard = False
                return None
            self._tb = SummaryWriter(
                log_dir=os.path.join(self.save_dir, "tensorboard"))
        return self._tb

    def _copy_truncated_metrics(self, old_metrics: str, epoch):
        """Carry metrics.csv rows up to the resume epoch into the forked run
        (and seed the in-memory history so loss.png stays continuous)."""
        with open(old_metrics) as f:
            rows = list(csv.DictReader(f))
        try:
            limit = int(epoch)
        except (TypeError, ValueError):
            limit = None  # 'latest'/'best': keep everything
        kept = [r for r in rows
                if limit is None or float(r.get("epoch", -1)) < limit]
        if not kept:
            return
        with open(self.metrics_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(kept[0].keys()))
            w.writeheader()
            w.writerows(kept)
        for r in kept:
            for k, v in r.items():
                try:
                    self._metric_history.setdefault(k, []).append(float(v))
                except (TypeError, ValueError):
                    pass

    # -- metrics ----------------------------------------------------------
    def plot_losses_and_metrics(self, epoch_metrics: dict[str, dict], epoch: int):
        row: dict[str, Any] = {"epoch": epoch}
        for group in epoch_metrics.values():
            row.update(group)
        for k, v in row.items():
            self._metric_history.setdefault(k, []).append(v)
        if not self.save_to_disk:
            return
        exists = os.path.exists(self.metrics_path)
        fieldnames = list(row.keys())
        if exists:
            with open(self.metrics_path) as f:
                old = list(csv.reader(f))
            if old and old[0] != fieldnames:
                fieldnames = old[0]
        with open(self.metrics_path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fieldnames, extrasaction="ignore")
            if not exists:
                w.writeheader()
            w.writerow(row)
        self._plot_loss_png()
        tb = self._tb_writer()
        if tb is not None:
            for k, v in row.items():
                if k == "epoch":
                    continue
                try:
                    tb.add_scalar(k, float(v), epoch)
                except (TypeError, ValueError):
                    pass
            tb.flush()

    def _plot_loss_png(self):
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        keys = [k for k in self._metric_history if k != "epoch"]
        if not keys:
            return
        ncols = min(3, len(keys))
        nrows = -(-len(keys) // ncols)
        fig, axes = plt.subplots(nrows, ncols,
                                 figsize=(4 * ncols, 3 * nrows), squeeze=False)
        for i, k in enumerate(keys):
            ax = axes[i // ncols][i % ncols]
            ax.plot(self._metric_history[k])
            ax.set_title(k, fontsize=8)
        fig.tight_layout()
        fig.savefig(os.path.join(self.save_dir, "loss.png"))
        plt.close(fig)

    def get_max_of_metric(self, group: str, metric_name: str):
        """Best value + epoch from metrics.csv (resume path,
        reference ``visualizer.py:258-260``)."""
        if not os.path.exists(self.metrics_path):
            return -1, -1
        with open(self.metrics_path) as f:
            rows = list(csv.DictReader(f))
        vals = [(float(r[metric_name]), int(float(r["epoch"])))
                for r in rows if r.get(metric_name) not in (None, "", "nan")]
        if not vals:
            return -1, -1
        best = max(vals)
        return best[0], best[1]

    # -- checkpoints --------------------------------------------------------
    def save_model(self, network_state, optimizer_state, epoch: int,
                   config: dict, name: str) -> str:
        """Save `{tag}_{netname}_model.ckpt` or `{tag}_{optname}.ckpt`
        (reference tag scheme, ``visualizer.py:225-238``)."""
        from octa_tpu.io.checkpoints import save_checkpoint

        ckdir = os.path.join(self.save_dir, "checkpoints")
        if network_state is not None:
            path = os.path.join(ckdir, f"{name}_model.ckpt")
            save_checkpoint(path, {"epoch": epoch,
                                   "model": network_state["params"],
                                   "config": _plain(config)})
        else:
            path = os.path.join(ckdir, f"{name}.ckpt")
            save_checkpoint(path, {"epoch": epoch,
                                   "optimizer": optimizer_state,
                                   "config": _plain(config)})
        return path

    # -- architecture -------------------------------------------------------
    def save_model_architecture(self, model, _sample=None):
        if not self.save_to_disk:
            return
        lines = [f"{type(model).__name__}"]
        for name, n in model.num_parameters().items():
            lines.append(f"  {name}: {n:,} parameters")
        with open(os.path.join(self.save_dir, "architecture.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")

    def log_model_params(self, model, epoch: int):
        """Parameter histograms to TensorBoard (reference
        ``visualizer.py:248-253``); no-op unless save_to_tensorboard."""
        tb = self._tb_writer()
        if tb is None:
            return
        states = getattr(model, "network_states", None)
        if not isinstance(states, dict):
            return
        import jax

        for net_name, state in states.items():
            params = state.get("params", state) if isinstance(state, dict) \
                else state
            flat = jax.tree_util.tree_flatten_with_path(params)[0]
            for path, leaf in flat:
                keystr = net_name + "/".join(
                    str(getattr(p, "key", getattr(p, "idx", ""))) for p in path)
                try:
                    tb.add_histogram(keystr, np.asarray(leaf), epoch)
                except (TypeError, ValueError):
                    pass
        tb.flush()

    # -- sample plots ---------------------------------------------------------
    def _save_grid(self, images: list[np.ndarray], titles: list[str],
                   filename: str) -> str:
        path = os.path.join(self.save_dir, filename)
        if not self.save_to_disk:
            return path
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n = len(images)
        ncols = min(3, n)
        nrows = -(-n // ncols)
        fig, axes = plt.subplots(nrows, ncols,
                                 figsize=(4 * ncols, 4 * nrows), squeeze=False)
        for i, (img, t) in enumerate(zip(images, titles)):
            ax = axes[i // ncols][i % ncols]
            arr = np.asarray(img, np.float32).squeeze()
            ax.imshow(arr, cmap="gray")
            ax.set_title(t, fontsize=8)
            ax.axis("off")
        for j in range(len(images), nrows * ncols):
            axes[j // ncols][j % ncols].axis("off")
        fig.tight_layout()
        fig.savefig(path)
        plt.close(fig)
        return path

    def plot_sample(self, image, prediction, label=None, *, path="",
                    suffix="") -> str:
        imgs = [image, prediction] + ([label] if label is not None else [])
        titles = ["image", "prediction"] + (["label"] if label is not None else [])
        return self._save_grid(imgs, titles, f"sample_{suffix}.png")

    def plot_gan_seg_sample(self, real_a, fake_b, pred, real_b, idt_b,
                            real_b_seg, *, path_a="", path_b="",
                            suffix="") -> str:
        return self._save_grid(
            [real_a, fake_b, pred, real_b, idt_b, real_b_seg],
            ["real_A", "fake_B", "fake_B_seg", "real_B", "idt_B", "real_B_seg"],
            f"sample_{suffix}.png")

    def plot_cut_sample(self, real_a, fake_b, real_b, idt_b, *, suffix="") -> str:
        return self._save_grid(
            [real_a, fake_b, real_b, idt_b],
            ["real_A", "fake_B", "real_B", "idt_B"],
            f"sample_{suffix}.png")

    def save_volume(self, volume: np.ndarray, name: str):
        np.save(os.path.join(self.save_dir, f"{name}.npy"),
                np.asarray(volume))


def plot_single_image(save_dir: str, image: np.ndarray, name: str):
    """Write one prediction image (reference ``visualizer.py:330-339``)."""
    from PIL import Image

    os.makedirs(save_dir, exist_ok=True)
    arr = np.asarray(image, np.float32).squeeze()
    if arr.ndim == 3:  # 3D volume -> save npy next to a MIP png
        np.save(os.path.join(save_dir, name + ".npy"), arr)
        arr = arr.max(axis=-1)
    arr = np.clip(arr, 0, 1) if arr.max() <= 1.0 else np.clip(arr / 255.0, 0, 1)
    Image.fromarray((arr * 255).astype(np.uint8)).save(
        os.path.join(save_dir, name if name.endswith(".png") else name + ".png"))


def plot_comparison(save_dir: str, image: np.ndarray, prediction: np.ndarray,
                    name: str, path: str = ""):
    """Side-by-side input/prediction figure next to a prediction
    (reference ``test.py:88-89`` with ``save_comparisons``)."""
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    os.makedirs(save_dir, exist_ok=True)
    fig, axes = plt.subplots(1, 2, figsize=(12, 6))
    for ax, (title, arr) in zip(axes, (("image", image),
                                       ("prediction", prediction))):
        a = np.asarray(arr, np.float32).squeeze()
        if a.ndim == 3:
            a = a.max(axis=-1)  # MIP for 3D volumes
        ax.imshow(a, cmap="gray")
        ax.set_title(title)
        ax.axis("off")
    if path:
        fig.suptitle(os.path.basename(str(path)))
    fig.tight_layout()
    fig.savefig(os.path.join(
        save_dir, name if name.endswith(".png") else name + ".png"))
    plt.close(fig)


def _plain(obj):
    """YAML-safe plain structure (drop non-serializable values)."""
    if isinstance(obj, dict):
        return {str(k): _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    # numpy scalars BEFORE the float check: np.float64 subclasses float and
    # would otherwise pass through raw, crashing yaml.safe_dump
    if isinstance(obj, np.generic):
        return obj.item()
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)
