"""Binary morphology + connected components.

Replaces the reference's skimage/scipy/MONAI morphology usages
(``RemoveSmallObjects``, ``KeepLargestConnectedComponent``,
``binary_dilation`` — ``data/data_transforms.py``, post-processing configs).

Connected components:
- :func:`label_host` — scipy.ndimage.label (C union-find), used in the
  evaluation/post-processing path where the data is already on host.
- :func:`connected_components_device` — iterative min-label propagation under
  ``lax.while_loop`` (device-resident; O(geodesic diameter) sweeps). Useful
  for fully-fused TPU pipelines where a host round-trip is worse.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def binary_dilation(x: jax.Array, iterations: int = 1,
                    connectivity: int = 1) -> jax.Array:
    """Binary dilation with the scipy default cross structuring element
    (connectivity=1) or full 3x3 (connectivity=2). x: [..., H, W]."""
    y = (x > 0).astype(jnp.float32)
    for _ in range(iterations):
        if connectivity == 1:
            z = jnp.pad(y, [(0, 0)] * (y.ndim - 2) + [(1, 1), (1, 1)])
            h, w = y.shape[-2:]

            def sh(dr, dc):
                return jax.lax.dynamic_slice_in_dim(
                    jax.lax.dynamic_slice_in_dim(z, 1 + dr, h, y.ndim - 2),
                    1 + dc, w, y.ndim - 1)

            y = jnp.maximum(
                y, jnp.maximum(jnp.maximum(sh(-1, 0), sh(1, 0)),
                               jnp.maximum(sh(0, -1), sh(0, 1))))
        else:
            y = jax.lax.reduce_window(
                y, -jnp.inf, jax.lax.max,
                (1,) * (y.ndim - 2) + (3, 3), (1,) * y.ndim,
                [(0, 0)] * (y.ndim - 2) + [(1, 1), (1, 1)])
    return y


def label_host(mask: np.ndarray, connectivity: int = 1):
    """Connected-component labeling on host (scipy.ndimage.label)."""
    from scipy import ndimage as ndi

    if mask.ndim == 2:
        structure = ndi.generate_binary_structure(2, connectivity)
    else:
        structure = ndi.generate_binary_structure(mask.ndim, connectivity)
    return ndi.label(mask, structure=structure)


def remove_small_objects(mask: np.ndarray, min_size: int = 64,
                         connectivity: int = 1) -> np.ndarray:
    """Remove connected components smaller than ``min_size`` (host path;
    MONAI ``RemoveSmallObjects`` semantics used in post-processing,
    ``configs/config_template.yml:159-166``)."""
    mask = np.asarray(mask)
    binary = mask > 0
    lab, n = label_host(binary, connectivity)
    if n == 0:
        return mask.copy()
    sizes = np.bincount(lab.ravel())
    keep = sizes >= min_size
    keep[0] = False
    return np.where(keep[lab], mask, 0)


def keep_largest_connected_component(mask: np.ndarray,
                                     connectivity: int = 2) -> np.ndarray:
    """Keep only the largest foreground component (host path; MONAI
    ``KeepLargestConnectedComponent`` used by ``RemoveOuterNoise``,
    ``data/data_transforms.py:418-432``)."""
    mask = np.asarray(mask)
    binary = mask > 0
    lab, n = label_host(binary, connectivity)
    if n == 0:
        return mask.copy()
    sizes = np.bincount(lab.ravel())
    sizes[0] = 0
    largest = sizes.argmax()
    return np.where(lab == largest, mask, 0)


@functools.partial(jax.jit, static_argnames=("connectivity",))
def connected_components_device(mask: jax.Array,
                                connectivity: int = 1) -> jax.Array:
    """Device CC labeling of a binary [H, W] image by iterative min-label
    propagation. Returns int32 labels (0 = background, labels are arbitrary
    distinct positive ints, NOT consecutive)."""
    h, w = mask.shape
    fg = mask > 0
    lab0 = jnp.where(
        fg, jnp.arange(1, h * w + 1, dtype=jnp.int32).reshape(h, w), 0
    )
    big = jnp.int32(h * w + 2)

    def prop(lab):
        x = jnp.where(fg, lab, big)
        z = jnp.pad(x, ((1, 1), (1, 1)), constant_values=big)
        cand = [x, z[:-2, 1:-1], z[2:, 1:-1], z[1:-1, :-2], z[1:-1, 2:]]
        if connectivity == 2:
            cand += [z[:-2, :-2], z[:-2, 2:], z[2:, :-2], z[2:, 2:]]
        m = functools.reduce(jnp.minimum, cand)
        return jnp.where(fg, m, 0)

    def cond(state):
        lab, changed = state
        return changed

    def body(state):
        lab, _ = state
        # several sweeps per iteration to amortize the while_loop overhead
        new = lab
        for _ in range(8):
            new = prop(new)
        return new, jnp.any(new != lab)

    out, _ = jax.lax.while_loop(cond, body, (lab0, jnp.array(True)))
    return out


@functools.partial(jax.jit, static_argnames=("min_size", "connectivity"))
def remove_small_objects_device(mask: jax.Array, min_size: int = 64,
                                connectivity: int = 1) -> jax.Array:
    """Device-resident remove-small-objects for fused TPU pipelines."""
    lab = connected_components_device(mask, connectivity)
    h, w = mask.shape
    sizes = jnp.zeros((h * w + 2,), jnp.int32).at[lab.ravel()].add(1)
    keep = (sizes >= min_size).at[0].set(False)
    return jnp.where(keep[lab], mask, jnp.zeros_like(mask))
