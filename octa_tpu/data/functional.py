"""Pure-JAX image augmentation primitives (on-device, batch/vmap friendly).

These are the building blocks for the config-driven transform pipeline
(``octa_tpu.data.transforms``). In the reference every transform runs
per-sample inside CPU DataLoader workers (``data/data_transforms.py``); here
the random transforms are pure functions of explicit PRNG keys that fuse into
the jitted train step.

Unless noted, images are [H, W] float32 (vmap for batches/channels).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def resize_bilinear(img: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Bilinear resize with half-pixel centers (= torch align_corners=False)."""
    return jax.image.resize(img, (*size,) if img.ndim == 2 else
                            (*img.shape[:-2], *size), method="linear")


def scale_intensity(img: jax.Array, minv=0.0, maxv=1.0) -> jax.Array:
    """MONAI ScaleIntensityd: min-max rescale to [minv, maxv]."""
    lo = jnp.min(img)
    hi = jnp.max(img)
    rng_ = jnp.maximum(hi - lo, 1e-12)
    return (img - lo) / rng_ * (maxv - minv) + minv


def as_discrete(img: jax.Array, threshold: float) -> jax.Array:
    return (img >= threshold).astype(img.dtype)


def rot90_traceable(img: jax.Array, k: jax.Array) -> jax.Array:
    """rot90 by a traced k in {0,1,2,3} (square images)."""
    return jax.lax.switch(
        k % 4,
        [lambda x: x,
         lambda x: jnp.rot90(x, 1),
         lambda x: jnp.rot90(x, 2),
         lambda x: jnp.rot90(x, 3)],
        img,
    )


def flip(img: jax.Array, axis: int) -> jax.Array:
    return jnp.flip(img, axis=axis)


def rand_flip(img: jax.Array, rng: jax.Array, axes=(0, 1), prob=0.5):
    """MONAI RandFlipd over the listed spatial axes (independent coin each)."""
    keys = jax.random.split(rng, len(axes))
    for ax, k in zip(axes, keys):
        do = jax.random.bernoulli(k, prob)
        img = jnp.where(do, jnp.flip(img, axis=ax), img)
    return img


def rotate_bilinear(img: jax.Array, angle_deg: jax.Array,
                    pad_zeros: bool = True) -> jax.Array:
    """Rotate around the image center by ``angle_deg`` (bilinear, zeros fill;
    torchvision ``rotate``/MONAI RandRotated padding_mode='zeros')."""
    h, w = img.shape
    theta = jnp.deg2rad(angle_deg)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    yc, xc = yy - cy, xx - cx
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    src_y = cos * yc - sin * xc + cy
    src_x = sin * yc + cos * xc + cx
    return _bilinear_sample(img, src_y, src_x, pad_zeros)


def _bilinear_sample(img, src_y, src_x, pad_zeros=True):
    h, w = img.shape
    y0 = jnp.floor(src_y)
    x0 = jnp.floor(src_x)
    wy = src_y - y0
    wx = src_x - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def at(yi, xi):
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        v = img[yc, xc]
        if pad_zeros:
            inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            v = jnp.where(inside, v, 0.0)
        return v

    v00 = at(y0i, x0i)
    v01 = at(y0i, x0i + 1)
    v10 = at(y0i + 1, x0i)
    v11 = at(y0i + 1, x0i + 1)
    return ((1 - wy) * (1 - wx) * v00 + (1 - wy) * wx * v01
            + wy * (1 - wx) * v10 + wy * wx * v11)


def decrease_resolution(img: jax.Array, factor: jax.Array,
                        min_factor: float = 0.25) -> jax.Array:
    """Nearest down-then-up resampling by a *traced* factor in (0, 1].

    Matches torch's ``interpolate(scale_factor=f)`` (nearest) followed by
    ``interpolate(size=orig)`` (nearest) used by RandomDecreaseResolutiond
    (``data/data_transforms.py:477-496``): out[i,j] =
    img[floor(floor(i*m/H)*H/m), ...] with m = floor(H*f). Static shapes —
    the factor only changes gather indices.
    """
    h, w = img.shape
    mh = jnp.floor(h * factor)
    mw = jnp.floor(w * factor)
    iy = jnp.floor(jnp.floor(jnp.arange(h) * mh / h) * h / mh).astype(jnp.int32)
    ix = jnp.floor(jnp.floor(jnp.arange(w) * mw / w) * w / mw).astype(jnp.int32)
    return img[jnp.clip(iy, 0, h - 1)][:, jnp.clip(ix, 0, w - 1)]


def gaussian_blur(img: jax.Array, sigma: float, truncate: float = 4.0):
    """Separable Gaussian blur (scipy gaussian_filter semantics, reflect)."""
    import numpy as np

    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k = jnp.asarray(k / k.sum(), img.dtype)
    pad = radius
    out = jnp.pad(img, ((pad, pad), (0, 0)), mode="reflect")
    out = jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"),
                   in_axes=1, out_axes=1)(out)
    out = jnp.pad(out, ((0, 0), (pad, pad)), mode="reflect")
    out = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(out)
    return out


def rand_crop_or_pad(img: jax.Array, rng: jax.Array, factor: jax.Array):
    """Zoom crop (factor < 1) — dynamic crop resized back to input shape.

    The reference's RandCropOrPadd (``data_transforms.py:543-585``) returns a
    different-sized tensor; under jit we keep static shapes by resizing the
    crop back (used by the Giarratano configs where the crop is immediately
    resized downstream anyway).
    """
    h, w = img.shape
    sh = jnp.maximum((h * factor).astype(jnp.int32), 1)
    sw = jnp.maximum((w * factor).astype(jnp.int32), 1)
    k1, k2 = jax.random.split(rng)
    oy = jax.random.randint(k1, (), 0, jnp.maximum(h - sh + 1, 1))
    ox = jax.random.randint(k2, (), 0, jnp.maximum(w - sw + 1, 1))
    yy = oy + (jnp.arange(h) * sh / h).astype(jnp.int32)
    xx = ox + (jnp.arange(w) * sw / w).astype(jnp.int32)
    return img[jnp.clip(yy, 0, h - 1)][:, jnp.clip(xx, 0, w - 1)]


def add_line_artifact(img: jax.Array, rng: jax.Array) -> jax.Array:
    """Blurred horizontal band artifact (``AddLineArtifact``,
    ``data_transforms.py:518-541``): 9-row band blended with a 7x7 box blur."""
    h, w = img.shape
    c = jnp.array([0.025, 0.075, 0.375, 0.875, 1.0, 0.875, 0.375, 0.075, 0.025])
    start = jax.random.randint(rng, (), 0, h - 9 + 1)
    band = jax.lax.dynamic_slice(img, (start, 0), (9, w))
    kernel = jnp.full((7, 7), 1.0 / 50.0)
    bandp = jnp.pad(band, ((3, 3), (3, 3)))
    blurred = jax.lax.conv_general_dilated(
        bandp[None, :, :, None], kernel[:, :, None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]
    mixed = band * (1 - c[:, None]) + c[:, None] * blurred
    return jax.lax.dynamic_update_slice(img, mixed, (start, 0))


def add_random_background_noise(img: jax.Array, background: jax.Array,
                                rng: jax.Array) -> jax.Array:
    """``img = max(img, background * U(0,1))`` per pixel
    (``AddRandomBackgroundNoised``, ``data_transforms.py:498-516``)."""
    speckle = jax.random.uniform(rng, img.shape)
    return jnp.maximum(img, background * speckle)


def speckle_brightness(img: jax.Array, rng: jax.Array,
                       grid=(9, 9)) -> jax.Array:
    """``SpeckleBrightnesd`` (``data_transforms.py:25-42``): control-grid
    brightness field C in [0.5,1], R = C - U*(1-C), img *= R, then
    renormalize (/max, -min as in the reference's odd ordering)."""
    k1, k2 = jax.random.split(rng)
    c = jax.random.uniform(k1, grid) * 0.5 + 0.5
    C = jax.image.resize(c, img.shape, method="linear")
    R = C - jax.random.uniform(k2, img.shape) * (1 - C)
    out = img * R
    out = out / jnp.maximum(jnp.max(out), 1e-12)
    return out - jnp.min(out)
