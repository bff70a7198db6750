"""Evaluation metrics + MetricsManager (reference ``utils/metrics.py``).

Heavy per-image computations (Dice/IoU/confusion counts, Zhang-Suen clDice)
are jitted device reductions; the manager accumulates Python floats across
batches and aggregates with nanmean, reproducing the reference's
``aggregate_and_reset`` / ``get_comp_metric`` API so the training loop and
``schedule_experiments.sh``-style tooling keep working.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from octa_tpu.ops.skeleton import cl_dice
from octa_tpu.utils.enums import Phase


@jax.jit
def _counts(pred: jax.Array, label: jax.Array):
    p = pred.astype(bool).ravel()
    y = label.astype(bool).ravel()
    tp = jnp.sum(p & y)
    tn = jnp.sum(~p & ~y)
    fp = jnp.sum(p & ~y)
    fn = jnp.sum(~p & y)
    return tp, tn, fp, fn


def dice_score(pred, label) -> float:
    """MacroDiceMetric semantics (``metrics.py:92-120``): nan when the
    ground truth is empty."""
    tp, tn, fp, fn = _counts(pred, label)
    tp, fp, fn = float(tp), float(fp), float(fn)
    if tp + fn == 0:
        return float("nan")
    return 2.0 * tp / (2 * tp + fp + fn)


def iou_score(pred, label) -> float:
    tp, tn, fp, fn = _counts(pred, label)
    union = float(tp + fp + fn)
    if union == 0:
        return float("nan")
    return float(tp) / union


def accuracy_score(pred, label) -> float:
    tp, tn, fp, fn = _counts(pred, label)
    return float(tp + tn) / float(tp + tn + fp + fn)


def recall_score(pred, label) -> float:
    tp, tn, fp, fn = _counts(pred, label)
    denom = float(tp + fn)
    return float(tp) / denom if denom else float("nan")


def precision_score(pred, label) -> float:
    tp, tn, fp, fn = _counts(pred, label)
    denom = float(tp + fp)
    return float(tp) / denom if denom else float("nan")


def roc_auc_score(pred: np.ndarray, label: np.ndarray) -> float:
    """ROC AUC via the Mann-Whitney rank statistic (ties averaged), matching
    MONAI ``compute_roc_auc`` on flattened probabilities."""
    y = np.asarray(label).ravel() > 0
    s = np.asarray(pred, np.float64).ravel()
    n_pos = int(y.sum())
    n_neg = y.size - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty_like(s)
    sorted_s = s[order]
    ranks[order] = np.arange(1, s.size + 1, dtype=np.float64)
    # average ranks over ties
    _, inv, cnt = np.unique(sorted_s, return_inverse=True, return_counts=True)
    cum = np.cumsum(cnt)
    avg = (cum - (cnt - 1) / 2.0)
    ranks[order] = avg[inv]
    auc = (ranks[y].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    return float(auc)


def cl_dice_score(pred, label) -> float:
    return float(cl_dice(jnp.asarray(pred), jnp.asarray(label)))


class _ListMetric:
    def __init__(self, fn, volumetric: bool = False):
        self.fn = fn
        self.volumetric = volumetric
        self.scores: list[float] = []

    def __call__(self, y_pred, y):
        for p, t in zip(y_pred, y):
            p = np.asarray(p)
            t = np.asarray(t)
            if self.volumetric and p.ndim == 3:
                # z-stack prediction (3D recon): score the whole volume —
                # the reference's clDice takes the 3D array through its
                # skeletonize(method='lee') branch (utils/cldice.py:31-33)
                self.scores.append(self.fn(p, t))
                continue
            # iterate channels like the reference's per-layer loop
            for c in range(p.shape[0]) if p.ndim >= 3 else [None]:
                pc = p[c] if c is not None else p
                tc = t[c] if c is not None else t
                self.scores.append(self.fn(pc, tc))

    def aggregate(self) -> float:
        if not self.scores:
            return 0.0
        return float(np.nanmean(self.scores))

    def reset(self):
        self.scores = []


def _is_zstack(config: dict) -> bool:
    """True for the 3D-reconstruction task family: a ves-seg model whose
    output channels are z-slices of one volume (reference
    config_3d_recon_supervised.yml — out_channels 44 at spatial_dims 2),
    where ClDice must be scored volumetrically."""
    g = config.get("General", {}) if isinstance(config, dict) else {}
    model = g.get("model", {}) or {}
    return (str(g.get("task", "")) == "ves-seg"
            and int(model.get("out_channels", 1) or 1) > 1)


class MetricsManager:
    """Reference-compatible manager (``metrics.py:165-196``): Train phase
    tracks DSC+IoU; Validation/Test adds ClDice, AUC, ACC, Recall, Precision.
    Comparison metric is DSC."""

    def __init__(self, phase: Phase = Phase.TRAIN, volumetric: bool = False):
        """``volumetric=True`` scores ClDice on whole [Z, H, W] z-stack
        predictions (3D-recon task) instead of per-channel slices."""
        base = {"DSC": _ListMetric(dice_score), "IoU": _ListMetric(iou_score)}
        if phase != Phase.TRAIN:
            base.update({
                "ClDice": _ListMetric(cl_dice_score, volumetric=volumetric),
                "AUC": _ListMetric(roc_auc_score),
                "ACC": _ListMetric(accuracy_score),
                "Recall": _ListMetric(recall_score),
                "Precision": _ListMetric(precision_score),
            })
        self.metrics = base
        self.comp = "DSC"

    def __call__(self, y_pred, y):
        for v in self.metrics.values():
            v(y_pred=y_pred, y=y)

    def aggregate_and_reset(self, prefix: str = "") -> dict[str, float]:
        d = {}
        for k, v in self.metrics.items():
            d[f"{prefix}_{k}"] = v.aggregate()
            v.reset()
        return d

    def get_comp_metric(self, prefix: str) -> str:
        return f"{prefix}_{self.comp}"
