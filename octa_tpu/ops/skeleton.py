"""Skeletonization and clDice on TPU.

- :func:`skeletonize` — Zhang-Suen two-subiteration thinning, the algorithm
  behind ``skimage.morphology.skeletonize`` (2D) used by the reference's
  clDice metric (``utils/cldice.py:19-35``). Fully vectorized elementwise
  update under ``lax.while_loop`` (simultaneous deletion per sub-iteration),
  vmap-able over a batch.
- :func:`soft_skeletonize` — differentiable min/max-pool soft skeleton
  (Shit et al., clDice loss), usable as a training loss on TPU.
- :func:`cl_score` / :func:`cl_dice` — topology precision/sensitivity.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _neighbors(img):
    """The 8 neighbors P2..P9 (N, NE, E, SE, S, SW, W, NW) via zero-padded
    shifts. img: [..., H, W] float/bool."""
    z = jnp.pad(img, [(0, 0)] * (img.ndim - 2) + [(1, 1), (1, 1)])
    h, w = img.shape[-2], img.shape[-1]

    def sh(dr, dc):
        return jax.lax.dynamic_slice_in_dim(
            jax.lax.dynamic_slice_in_dim(z, 1 + dr, h, axis=img.ndim - 2),
            1 + dc, w, axis=img.ndim - 1,
        )

    p2 = sh(-1, 0)   # N
    p3 = sh(-1, 1)   # NE
    p4 = sh(0, 1)    # E
    p5 = sh(1, 1)    # SE
    p6 = sh(1, 0)    # S
    p7 = sh(1, -1)   # SW
    p8 = sh(0, -1)   # W
    p9 = sh(-1, -1)  # NW
    return p2, p3, p4, p5, p6, p7, p8, p9


def _zhang_subiter(img, first: bool):
    p = _neighbors(img)
    p2, p3, p4, p5, p6, p7, p8, p9 = [x.astype(jnp.int32) for x in p]
    b = p2 + p3 + p4 + p5 + p6 + p7 + p8 + p9
    seq = [p2, p3, p4, p5, p6, p7, p8, p9, p2]
    a = jnp.zeros_like(b)
    for i in range(8):
        a = a + ((seq[i] == 0) & (seq[i + 1] == 1)).astype(jnp.int32)
    cond = (img == 1) & (b >= 2) & (b <= 6) & (a == 1)
    if first:
        cond = cond & (p2 * p4 * p6 == 0) & (p4 * p6 * p8 == 0)
    else:
        cond = cond & (p2 * p4 * p8 == 0) & (p2 * p6 * p8 == 0)
    return jnp.where(cond, 0, img)


@jax.jit
def skeletonize(img: jax.Array) -> jax.Array:
    """Zhang-Suen thinning of a binary image [H, W] (or batched [..., H, W]).

    Returns a uint8 skeleton. Matches skimage.morphology.skeletonize (Zhang's
    method, the 2D default) up to its identical simultaneous-deletion rule.
    """
    x0 = (img > 0).astype(jnp.uint8)

    def cond(state):
        x, changed = state
        return changed

    def body(state):
        x, _ = state
        x1 = _zhang_subiter(x, True)
        x2 = _zhang_subiter(x1, False)
        return x2, jnp.any(x2 != x)

    out, _ = jax.lax.while_loop(cond, body, (x0, jnp.array(True)))
    return out


def _pool(x, mode, size=3):
    init = -jnp.inf if mode == "max" else jnp.inf
    op = jax.lax.max if mode == "max" else jax.lax.min
    pad = size // 2
    return jax.lax.reduce_window(
        x, init, op,
        window_dimensions=(1,) * (x.ndim - 2) + (size, size),
        window_strides=(1,) * x.ndim,
        padding=[(0, 0)] * (x.ndim - 2) + [(pad, pad), (pad, pad)],
    )


def soft_erode(x):
    return -_pool(-x, "max")


def soft_dilate(x):
    return _pool(x, "max")


def soft_open(x):
    return soft_dilate(soft_erode(x))


@functools.partial(jax.jit, static_argnames=("iters",))
def soft_skeletonize(x: jax.Array, iters: int = 25) -> jax.Array:
    """Differentiable soft skeleton (clDice loss; Shit et al. CVPR'21).

    x: [..., H, W] soft segmentation in [0, 1].
    """
    img1 = soft_open(x)
    skel = jax.nn.relu(x - img1)

    def body(i, carry):
        img, skel = carry
        img = soft_erode(img)
        opened = soft_open(img)
        delta = jax.nn.relu(img - opened)
        skel = skel + jax.nn.relu(delta - skel * delta)
        return img, skel

    _, skel = jax.lax.fori_loop(0, iters, body, (soft_erode(x), skel))
    return skel


def cl_score(v: jax.Array, s: jax.Array) -> jax.Array:
    """Skeleton volume overlap (reference ``cldice.py:6-16``)."""
    return jnp.sum(v * s) / jnp.maximum(jnp.sum(s), 1e-8)


def cl_dice(v_p: jax.Array, v_l: jax.Array) -> jax.Array:
    """clDice metric between binary prediction and label [H, W]
    (reference ``cldice.py:19-35``, 2D path with Zhang-Suen skeletons)."""
    v_p = (v_p > 0).astype(jnp.float32)
    v_l = (v_l > 0).astype(jnp.float32)
    s_l = skeletonize(v_l).astype(jnp.float32)
    s_p = skeletonize(v_p).astype(jnp.float32)
    tprec = cl_score(v_p, s_l)
    tsens = cl_score(v_l, s_p)
    return 2 * tprec * tsens / jnp.maximum(tprec + tsens, 1e-8)


def soft_cl_dice_loss(y_pred: jax.Array, y_true: jax.Array,
                      iters: int = 25, smooth: float = 1.0) -> jax.Array:
    """Differentiable clDice loss term (1 - soft clDice)."""
    skel_pred = soft_skeletonize(y_pred, iters)
    skel_true = soft_skeletonize(y_true, iters)
    tprec = (jnp.sum(skel_pred * y_true) + smooth) / (jnp.sum(skel_pred) + smooth)
    tsens = (jnp.sum(skel_true * y_pred) + smooth) / (jnp.sum(skel_true) + smooth)
    return 1.0 - 2.0 * tprec * tsens / (tprec + tsens)
