"""Loss functions as pure JAX, mirroring the reference registry
(``utils/losses.py:325-353``).

All losses are ``fn(y_pred, y) -> scalar`` (or the documented GAN signature)
and are jit/grad-safe. The ANT (adversarial noise training) loss is exposed
as :class:`ANTLoss` with an explicit functional inner ascent loop using
``jax.grad`` over the noise-model control points — the reference implements
the same 3-step PGA with an embedded torch SGD optimizer
(``utils/losses.py:80-109``).
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from octa_tpu.models import noise_model as nm


def dice_loss(y_pred, y, sigmoid=False, smooth_nr=1e-5, smooth_dr=1e-5):
    """MONAI DiceLoss semantics (include_background, mean reduction).

    y_pred, y: [B, H, W, C] (or any layout with batch first / channel last);
    reduction over all non-batch/channel dims.
    """
    if sigmoid:
        y_pred = jax.nn.sigmoid(y_pred)
    axes = tuple(range(1, y_pred.ndim - 1))
    intersection = jnp.sum(y_pred * y, axis=axes)
    denom = jnp.sum(y_pred, axis=axes) + jnp.sum(y, axis=axes)
    dice = (2.0 * intersection + smooth_nr) / (denom + smooth_dr)
    return jnp.mean(1.0 - dice)


def bce_with_logits(y_pred, y):
    return jnp.mean(
        jnp.maximum(y_pred, 0) - y_pred * y + jnp.log1p(jnp.exp(-jnp.abs(y_pred)))
    )


def bce(y_pred, y, eps=1e-7):
    p = jnp.clip(y_pred, eps, 1 - eps)
    return -jnp.mean(y * jnp.log(p) + (1 - y) * jnp.log(1 - p))


class DiceBCELoss:
    """(Dice + BCE)/2 (reference ``losses.py:111-121``)."""

    def __init__(self, sigmoid=False):
        self.sigmoid = sigmoid

    def __call__(self, y_pred, y):
        if self.sigmoid:
            return (dice_loss(y_pred, y, sigmoid=True) + bce_with_logits(y_pred, y)) / 2
        return (dice_loss(y_pred, y) + bce(y_pred, y)) / 2


class LSGANLoss:
    """Least-squares GAN loss (reference ``losses.py:183-202``)."""

    def __init__(self, target_real_label=1.0, target_fake_label=0.0):
        self.real = target_real_label
        self.fake = target_fake_label

    def __call__(self, prediction, target_is_real: bool):
        target = self.real if target_is_real else self.fake
        return jnp.mean((prediction - target) ** 2)


class L1Loss:
    def __call__(self, y_pred, y):
        return jnp.mean(jnp.abs(y_pred - y))


class MSELoss:
    def __call__(self, y_pred, y):
        return jnp.mean((y_pred - y) ** 2)


class CrossEntropyLoss:
    def __init__(self, weight=None):
        self.weight = weight

    def __call__(self, logits, labels):
        logp = jax.nn.log_softmax(logits, axis=-1)
        labels = labels.astype(jnp.int32)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        if self.weight is not None:
            w = jnp.asarray(self.weight)[labels]
            return jnp.sum(nll * w) / jnp.sum(w)
        return jnp.mean(nll)


class PatchNCELoss:
    """Temperature-scaled InfoNCE over patch features
    (reference ``losses.py:204-265``; CUT).

    feat_q, feat_k: [num_patches_total, dim] where num_patches_total =
    batch_size * patches_per_image. Returns the per-patch loss vector.
    """

    def __init__(self, batch_size: int,
                 nce_includes_all_negatives_from_minibatch=False,
                 nce_T: float = 0.07):
        self.batch_size = batch_size
        self.all_neg = nce_includes_all_negatives_from_minibatch
        self.nce_T = nce_T

    def __call__(self, feat_q, feat_k, neg_sample=None):
        num_patches, dim = feat_q.shape
        feat_k = jax.lax.stop_gradient(feat_k)
        l_pos = jnp.sum(feat_q * feat_k, axis=-1, keepdims=True)  # [N,1]
        b = 1 if self.all_neg else self.batch_size
        fq = feat_q.reshape(b, -1, dim)
        if neg_sample is not None:
            ns = neg_sample.reshape(b, -1, dim)
            l_neg = jnp.einsum("bpd,bqd->bpq", fq, ns).reshape(num_patches, -1)
        else:
            fk = feat_k.reshape(b, -1, dim)
            npatches = fq.shape[1]
            l_neg = jnp.einsum("bpd,bqd->bpq", fq, fk)
            diag = jnp.eye(npatches, dtype=bool)[None]
            l_neg = jnp.where(diag, -10.0, l_neg).reshape(num_patches, -1)
        logits = jnp.concatenate([l_pos, l_neg], axis=1) / self.nce_T
        return -jax.nn.log_softmax(logits, axis=1)[:, 0]


class LearnedPatchNCELoss(PatchNCELoss):
    """NEGCUT variant with explicit learned negatives
    (reference ``losses.py:267-322``); same math, negatives supplied."""


class WeightedCosineLoss:
    def __init__(self, weights=(1, 1, 1)):
        self.weights = jnp.asarray(weights)

    def __call__(self, y_pred, y):
        y = y.astype(jnp.int32)
        ypn = y_pred / (jnp.linalg.norm(y_pred, axis=-1, keepdims=True) + 1e-12)
        onehot = jax.nn.one_hot(y, y_pred.shape[-1])
        cos = jnp.sum(ypn * onehot, axis=-1)
        w = self.weights[y]
        return 1 - jnp.sum(w * cos) / jnp.sum(w)


class WeightedMSELoss:
    def __init__(self, weights):
        self.weights = jnp.asarray(weights)

    def __call__(self, y_pred, y):
        per = (y_pred - y) ** 2
        w = self.weights[y.astype(jnp.int32)]
        return jnp.sum(per * w) / jnp.sum(w)


class QWKLoss:
    """Quadratic-weighted-kappa loss (reference ``losses.py:136-170``)."""

    def __init__(self, scale=2.0, num_classes=3):
        self.scale = scale
        self.num_classes = num_classes

    def __call__(self, output, target):
        target = jax.nn.one_hot(
            target.reshape(-1).astype(jnp.int32), self.num_classes
        ).astype(output.dtype)
        output = jax.nn.softmax(output, axis=1)
        n = self.num_classes
        w = jnp.arange(n, dtype=jnp.float32) / (n - 1)
        w = (w - w[:, None]) ** 2
        conf = (output.T @ target).T
        hist_true = jnp.sum(target, axis=0)[:, None]
        hist_pred = jnp.sum(output, axis=0)[:, None]
        expected = (hist_true @ hist_pred.T) / jnp.sum(conf)
        qwk = 1 - jnp.sum(w * conf) / jnp.sum(w * expected)
        return -jnp.log(jax.nn.sigmoid(self.scale * qwk))


class ANTLoss:
    """Adversarial noise training (reference ``ANTLoss``,
    ``utils/losses.py:11-109``): 3 projected-gradient-ascent iterations
    maximizing the segmentation loss w.r.t. the noise-model control points,
    with consistent random rotate / resolution-decrease / crop applied to
    image and label. Returns the hardened (sample, label) pair.

    Functional: ``__call__(seg_apply, x, background, y, rng)`` where
    ``seg_apply(img) -> logits`` is the frozen forward of the segmentor.
    """

    def __init__(self, loss_fun: Callable, grid_size=(9, 9), lambda_delta=1.0,
                 lambda_speckle=0.7, lambda_gamma=0.3, max_decrease_res=0.25,
                 alpha=1e-3, crop=(1, 1), label_threshold=0.1, num_iters=3):
        self.loss_fun = loss_fun
        self.grid_size = tuple(grid_size)
        self.lambda_delta = lambda_delta
        self.lambda_speckle = lambda_speckle
        self.lambda_gamma = lambda_gamma
        self.max_decrease_res = max_decrease_res
        self.alpha = alpha
        self.crop = tuple(crop)
        self.label_threshold = label_threshold
        self.num_iters = num_iters

    def _augment(self, img, rot_k, angle, factors, crop_off, out_hw, rng):
        """Consistent rot90 + small rotation + res decrease + crop."""
        from octa_tpu.data import functional as F

        b = img.shape[0]
        img = jax.vmap(lambda im, k: F.rot90_traceable(im, k))(img, rot_k)
        img = jax.vmap(F.rotate_bilinear)(img, angle)
        img = jax.vmap(F.decrease_resolution, in_axes=(0, 0, None))(
            img, factors, self.max_decrease_res
        )
        if self.crop != (1, 1):
            ch = int(out_hw[0] * self.crop[0])
            cw = int(out_hw[1] * self.crop[1])
            img = jax.vmap(
                lambda im, off: jax.lax.dynamic_slice(im, (off[0], off[1]), (ch, cw))
            )(img, crop_off)
        return img

    def __call__(self, seg_apply: Callable, x, background, y, rng):
        b, h, w = y.shape[0], y.shape[1], y.shape[2]
        ks = jax.random.split(rng, 8)
        rot_k = jax.random.randint(ks[0], (b,), 0, 4)
        angle = jax.random.uniform(ks[1], (b,), minval=-10.0, maxval=10.0)
        factors = jax.random.uniform(
            ks[2], (b,), minval=self.max_decrease_res, maxval=1.0
        )
        ch = int(h * self.crop[0])
        cw = int(w * self.crop[1])
        crop_off = jnp.stack(
            [jax.random.randint(ks[3], (b,), 0, h - ch + 1),
             jax.random.randint(ks[4], (b,), 0, w - cw + 1)], axis=-1
        )

        from octa_tpu.data import functional as F

        y_aug = jax.vmap(lambda im, k: F.rot90_traceable(im, k))(y, rot_k)
        y_aug = jax.vmap(F.rotate_bilinear)(y_aug, angle)
        if self.crop != (1, 1):
            y_aug = jax.vmap(
                lambda im, off: jax.lax.dynamic_slice(im, (off[0], off[1]), (ch, cw))
            )(y_aug, crop_off)
        y_crop = (y_aug >= self.label_threshold).astype(jnp.float32)

        params = nm.sample_noise_params(ks[5], b, self.grid_size)
        noise_rng = ks[6]

        def make_sample(p):
            adv = nm.apply_noise_model(
                p, noise_rng, x, background,
                self.lambda_delta, self.lambda_speckle, self.lambda_gamma,
            )
            adv = jax.image.resize(adv, (b, h, w), method="linear")
            return self._augment(
                adv, rot_k, angle, factors, crop_off, (h, w), noise_rng
            )

        def loss_wrt_params(p):
            adv = make_sample(p)
            pred = seg_apply(adv[..., None])
            return self.loss_fun(pred, y_crop[..., None])

        for _ in range(self.num_iters - 1):
            grads = jax.grad(loss_wrt_params)(params)
            params = nm.pga_update(params, grads, self.alpha, "PGA")

        adv_sample = jax.lax.stop_gradient(make_sample(params))
        return adv_sample, y_crop


def get_loss_function_by_name(name: str, config: dict, scaler=None, loss=None):
    """Reference-compatible loss registry (``losses.py:325-353``)."""
    from octa_tpu.utils.enums import Phase

    weight = None
    if "Data" in config:
        weight = [1.0 / c for c in config["Data"]["class_balance"]]
    loss_map = {
        "AtLoss": lambda: ANTLoss(loss, **(config[Phase.TRAIN].get("AT") or {})),
        "DiceBCELoss": lambda: DiceBCELoss(True),
        "CrossEntropyLoss": lambda: CrossEntropyLoss(weight=weight),
        "CosineEmbeddingLoss": lambda: WeightedCosineLoss(weights=weight),
        "MSELoss": lambda: MSELoss(),
        "WeightedMSELoss": lambda: WeightedMSELoss(weights=weight),
        "QWKLoss": lambda: QWKLoss(),
        "LSGANLoss": lambda: LSGANLoss(),
        "L1Loss": lambda: L1Loss(),
        "PatchNCELoss": lambda: PatchNCELoss(
            batch_size=config[Phase.TRAIN]["batch_size"]),
        "LearnedPatchNCELoss": lambda: LearnedPatchNCELoss(
            batch_size=config[Phase.TRAIN]["batch_size"]),
        "ClDiceLoss": lambda: _cl_dice_combo_loss,
    }
    if name in loss_map:
        return loss_map[name]()
    print("Warning: No loss function defined. "
          "Ignore this message for parameterless models.")
    return lambda *args, **kwargs: None


def _cl_dice_combo_loss(y_pred, y, alpha=0.5):
    """DiceBCE + soft-clDice combination (BASELINE.json benchmark config 5)."""
    from octa_tpu.ops.skeleton import soft_cl_dice_loss

    base = DiceBCELoss(True)(y_pred, y)
    prob = jax.nn.sigmoid(y_pred)
    cl = soft_cl_dice_loss(prob[..., 0], y[..., 0])
    return (1 - alpha) * base + alpha * cl
