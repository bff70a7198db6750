"""Config-driven data transforms, name-compatible with the reference YAMLs.

The reference dispatches transform names through MONAI + its own registry
(``data/data_transforms.py:587-611``). Here every name used by the config
corpus resolves to a class in this module. Transforms operate on a sample
dict with channel-first arrays ([C, H, W], numpy or jax); compute-heavy
transforms (rasterization, resize, rotation, the noise model, GAN
translation) call jitted JAX functions so they run on the accelerator, not
in CPU worker processes like the reference.

Random transforms draw from an explicit ``RngPool`` seeded by
``General.seed`` (reference: ``set_random_state(seed)``).
"""
from __future__ import annotations

import pickle
import random as pyrandom
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from octa_tpu.data import functional as F
from octa_tpu.ops import raster


class RngPool:
    """Deterministic source of numpy generators, python Randoms and jax keys."""

    def __init__(self, seed: int):
        self.np = np.random.default_rng(seed)
        self.py = pyrandom.Random(seed + 1)
        self._key = jax.random.PRNGKey(seed)
        self._count = 0

    def next_key(self):
        self._count += 1
        return jax.random.fold_in(self._key, self._count)


class Transform:
    """Base dict transform."""

    def __init__(self, keys: Sequence[str] | str = (), allow_missing_keys=False,
                 **_ignored):
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.allow_missing_keys = allow_missing_keys
        self.rng: RngPool | None = None  # injected by the pipeline

    def set_rng(self, rng: RngPool):
        self.rng = rng

    def _iter_keys(self, data):
        for k in self.keys:
            if k in data:
                yield k
            elif not self.allow_missing_keys:
                raise KeyError(f"{type(self).__name__}: missing key {k}")

    def __call__(self, data: dict[str, Any]) -> dict[str, Any]:
        raise NotImplementedError


def _to_np(x):
    return np.asarray(x)


def _to_jax(x):
    return x if isinstance(x, jax.Array) else jnp.asarray(np.asarray(x))


# ---------------------------------------------------------------------------
# IO transforms (host)
# ---------------------------------------------------------------------------

class LoadImaged(Transform):
    def __init__(self, keys, image_only=True, allow_missing_keys=False, **kw):
        super().__init__(keys, allow_missing_keys)

    def __call__(self, data):
        for k in self._iter_keys(data):
            path = str(data[k])
            if path.endswith(".npy"):
                data[k] = np.load(path).astype(np.float32)
            elif path.endswith((".nii", ".nii.gz")):
                try:
                    import nibabel as nib

                    data[k] = np.asarray(
                        nib.load(path).get_fdata()).astype(np.float32)
                except ImportError:  # .nii.npy fallback written by our CLI
                    data[k] = np.load(path + ".npy").astype(np.float32)
            else:
                img = None
                if path.endswith(".png"):
                    # native libpng decoder (C++ thread pool for batches);
                    # PIL fallback below covers failures / other formats
                    from octa_tpu.native import read_png_native

                    img = read_png_native(path)
                if img is None:
                    from PIL import Image

                    img = np.asarray(Image.open(path))
                data[k] = img.astype(np.float32)
        return data


class ToGrayScaled(Transform):
    """RGB -> PIL 'L' grayscale (``data_transforms.py:389-400``)."""

    def __call__(self, data):
        from PIL import Image

        for k in self._iter_keys(data):
            arr = _to_np(data[k])
            if arr.ndim == 3:
                img = Image.fromarray(arr.astype(np.uint8)).convert("L")
                data[k] = np.asarray(img).astype(np.float32)
            else:
                data[k] = arr.astype(np.float32)
        return data


class LoadGraphAndFilterByRandomRadiusd(Transform):
    """CSV graph -> rasterized grayscale image(s) with per-key min_radius and
    a shared dropout blackdict (``data_transforms.py:358-387``). The splat
    kernel runs on device."""

    def __init__(self, keys, allow_missing_keys=False,
                 image_resolutions=((304, 304),), min_radius=(0,),
                 max_dropout_prob=0, MIP_axis=2, **kw):
        super().__init__(keys, allow_missing_keys)
        self.image_resolutions = [list(r) for r in image_resolutions]
        self.min_radius = list(min_radius)
        self.max_dropout_prob = max_dropout_prob
        self.mip_axis = MIP_axis

    def __call__(self, data):
        if "blackdict" in data:
            with open(data["blackdict"], "rb") as f:
                blackdict = pickle.load(f)
        else:
            blackdict = None
        arrays = None
        last_path = None
        for i, k in enumerate(self.keys):
            if k not in data:
                if self.allow_missing_keys:
                    continue
                raise KeyError(k)
            path = data[k]
            if arrays is None or path != last_path:
                arrays = raster.parse_graph_csv(path)
                last_path = path
            img, blackdict = raster.rasterize_forest(
                arrays, self.image_resolutions[i], self.mip_axis,
                min_radius=self.min_radius[i],
                max_dropout_prob=self.max_dropout_prob,
                blackdict=blackdict,
                rng=self.rng.py if self.rng else None,
            )
            data[k] = img.astype(np.float32)
        return data


# ---------------------------------------------------------------------------
# Shape / dtype transforms
# ---------------------------------------------------------------------------

class EnsureChannelFirstd(Transform):
    def __init__(self, keys, channel_dim="no_channel", strict_check=False,
                 allow_missing_keys=False, **kw):
        super().__init__(keys, allow_missing_keys)
        self.channel_dim = channel_dim

    def __call__(self, data):
        for k in self._iter_keys(data):
            arr = data[k]
            if self.channel_dim == "no_channel" or arr.ndim == 2:
                data[k] = arr[None] if arr.ndim == 2 else arr
            elif arr.ndim == 3 and self.channel_dim in (-1, 2):
                data[k] = np.moveaxis(_to_np(arr), -1, 0)
        return data


class AsChannelLast(Transform):
    def __call__(self, data):
        for k in self._iter_keys(data):
            data[k] = np.moveaxis(_to_np(data[k]), 0, -1)
        return data


class CastToTyped(Transform):
    _MAP = {
        "float32": np.float32, "float": np.float32, "float16": np.float16,
        "bfloat16": jnp.bfloat16, "uint8": np.uint8, "int64": np.int64,
        "long": np.int64, "int32": np.int32, "bool": np.bool_,
        "dtype": np.float32,  # substituted by the pipeline factory
    }

    def __init__(self, keys, dtype="float32", allow_missing_keys=False, **kw):
        super().__init__(keys, allow_missing_keys)
        self.dtype = dtype if isinstance(dtype, list) else [dtype] * len(self.keys)

    def __call__(self, data):
        for i, k in enumerate(self.keys):
            if k not in data:
                if self.allow_missing_keys:
                    continue
                raise KeyError(k)
            dt = self.dtype[min(i, len(self.dtype) - 1)]
            np_dt = self._MAP.get(str(dt), dt) if isinstance(dt, str) else dt
            x = data[k]
            if isinstance(x, jax.Array):
                data[k] = x.astype(np_dt)
            else:
                data[k] = _to_np(x).astype(np_dt)
        return data


class SelectSlice(Transform):
    def __init__(self, keys, allow_missing_keys=False, slice_selection=None, **kw):
        super().__init__(keys, allow_missing_keys)
        self.sl = tuple(slice(s, e) for s, e in slice_selection) if slice_selection else None

    def __call__(self, data):
        if self.sl is not None:
            for k in self._iter_keys(data):
                data[k] = data[k][self.sl]
        return data


# ---------------------------------------------------------------------------
# Intensity / geometry transforms (device)
# ---------------------------------------------------------------------------

class ScaleIntensityd(Transform):
    def __init__(self, keys, minv=0.0, maxv=1.0, allow_missing_keys=False, **kw):
        super().__init__(keys, allow_missing_keys)
        self.minv, self.maxv = minv, maxv

    def __call__(self, data):
        for k in self._iter_keys(data):
            data[k] = F.scale_intensity(_to_jax(data[k]), self.minv, self.maxv)
        return data


class Resized(Transform):
    def __init__(self, keys, spatial_size, mode="bilinear",
                 allow_missing_keys=False, **kw):
        super().__init__(keys, allow_missing_keys)
        self.size = tuple(spatial_size)
        self.mode = mode

    def __call__(self, data):
        for k in self._iter_keys(data):
            x = _to_jax(data[k]).astype(jnp.float32)
            method = "linear" if self.mode in ("bilinear", "linear") else self.mode
            data[k] = jax.image.resize(x, (*x.shape[:-2], *self.size), method=method)
        return data


class Resize(Resized):
    """Non-dict variant used in post-processing configs."""

    def __init__(self, spatial_size, mode="bilinear", **kw):
        super().__init__(keys=(), spatial_size=spatial_size, mode=mode)

    def __call__(self, x):  # type: ignore[override]
        x = _to_jax(x).astype(jnp.float32)
        method = "linear" if self.mode in ("bilinear", "linear") else self.mode
        return jax.image.resize(x, (*x.shape[:-2], *self.size), method=method)


class AsDiscreted(Transform):
    def __init__(self, keys, threshold=None, allow_missing_keys=False, **kw):
        super().__init__(keys, allow_missing_keys)
        self.threshold = threshold

    def __call__(self, data):
        for k in self._iter_keys(data):
            x = _to_jax(data[k])
            data[k] = (x >= self.threshold).astype(x.dtype)
        return data


class RandFlipd(Transform):
    def __init__(self, keys, prob=0.5, spatial_axis=(0, 1),
                 allow_missing_keys=False, **kw):
        super().__init__(keys, allow_missing_keys)
        self.prob = prob
        self.axes = [spatial_axis] if isinstance(spatial_axis, int) else list(spatial_axis)

    def __call__(self, data):
        if self.rng.np.random() < self.prob:
            for k in self._iter_keys(data):
                x = _to_jax(data[k])
                ax = [a + 1 for a in self.axes]  # skip channel dim
                data[k] = jnp.flip(x, axis=ax)
        return data


class Flipd(Transform):
    def __init__(self, keys, spatial_axis=0, allow_missing_keys=False, **kw):
        super().__init__(keys, allow_missing_keys)
        self.axis = spatial_axis

    def __call__(self, data):
        for k in self._iter_keys(data):
            data[k] = jnp.flip(_to_jax(data[k]), axis=self.axis + 1)
        return data


class RandRotate90d(Transform):
    def __init__(self, keys, prob=0.1, max_k=3, allow_missing_keys=False, **kw):
        super().__init__(keys, allow_missing_keys)
        self.prob, self.max_k = prob, max_k

    def __call__(self, data):
        if self.rng.np.random() < self.prob:
            k = int(self.rng.np.integers(1, self.max_k + 1))
            for key in self._iter_keys(data):
                data[key] = jnp.rot90(_to_jax(data[key]), k, axes=(-2, -1))
        return data


class Rotate90d(Transform):
    def __init__(self, keys, k=1, allow_missing_keys=False, **kw):
        super().__init__(keys, allow_missing_keys)
        self.k = k

    def __call__(self, data):
        for key in self._iter_keys(data):
            data[key] = jnp.rot90(_to_jax(data[key]), self.k, axes=(-2, -1))
        return data


class RandRotated(Transform):
    """Small-angle rotation, same angle for all keys (MONAI semantics:
    range_x in radians, bilinear, zero padding)."""

    def __init__(self, keys, prob=0.1, range_x=0.0, padding_mode="zeros",
                 mode="bilinear", allow_missing_keys=False, **kw):
        super().__init__(keys, allow_missing_keys)
        self.prob = prob
        self.range_x = range_x

    def __call__(self, data):
        if self.rng.np.random() < self.prob:
            angle = float(self.rng.np.uniform(-self.range_x, self.range_x))
            deg = np.degrees(angle)
            for k in self._iter_keys(data):
                x = _to_jax(data[k]).astype(jnp.float32)
                data[k] = jax.vmap(F.rotate_bilinear, in_axes=(0, None))(x, deg)
        return data


class RandCropOrPadd(Transform):
    """Random zoom crop/pad (``data_transforms.py:543-585``). factor < 1
    crops (same window for all keys); factor > 1 zero-pads around center."""

    def __init__(self, keys, prob=0.1, min_factor=1.0, max_factor=1.0, **kw):
        super().__init__(keys)
        self.prob, self.min_factor, self.max_factor = prob, min_factor, max_factor

    def __call__(self, data):
        if self.rng.np.random() < self.prob:
            factor = float(self.rng.np.uniform(self.min_factor, self.max_factor))
            sl = None
            for k in self._iter_keys(data):
                x = _to_np(data[k]) if not isinstance(data[k], jax.Array) else np.asarray(data[k])
                if factor < 1:
                    if sl is None:
                        sh = int(x.shape[1] * factor)
                        sw = int(x.shape[2] * factor)
                        oy = int(self.rng.np.integers(0, x.shape[1] - sh + 1))
                        ox = int(self.rng.np.integers(0, x.shape[2] - sw + 1))
                        sl = (slice(oy, oy + sh), slice(ox, ox + sw))
                    data[k] = x[:, sl[0], sl[1]]
                elif factor > 1:
                    frame = np.zeros(
                        (x.shape[0], int(x.shape[1] * factor), int(x.shape[2] * factor)),
                        x.dtype)
                    oy = (frame.shape[1] - x.shape[1]) // 2
                    ox = (frame.shape[2] - x.shape[2]) // 2
                    frame[:, oy:oy + x.shape[1], ox:ox + x.shape[2]] = x
                    data[k] = frame
        return data


# ---------------------------------------------------------------------------
# OCTA-specific noise transforms (device)
# ---------------------------------------------------------------------------

class AddRandomBackgroundNoised(Transform):
    def __init__(self, keys, delete_background=True, **kw):
        super().__init__(keys, True)
        self.delete_background = delete_background

    def __call__(self, data):
        for k in self._iter_keys(data):
            img = _to_jax(data[k]).astype(jnp.float32)
            if "background" in data:
                noise = _to_jax(data["background"]).astype(jnp.float32)
            else:
                noise = jax.random.uniform(self.rng.next_key(), img.shape)
            data[k] = jax.vmap(F.add_random_background_noise)(
                img, jnp.broadcast_to(noise, img.shape),
                jax.random.split(self.rng.next_key(), img.shape[0]))
        if self.delete_background and "background" in data:
            del data["background"]
        return data


class NoiseModeld(Transform):
    """Handcrafted contrast adaptation inside the pipeline
    (``data_transforms.py:435-475``); pure-JAX noise model on device."""

    def __init__(self, keys, prob=1.0, allow_missing_keys=False,
                 grid_size=(9, 9), lambda_delta=1.0, lambda_speckle=0.7,
                 lambda_gamma=0.3, alpha=0.2, downsample_factor=1, **kw):
        super().__init__(keys, allow_missing_keys)
        self.prob = prob
        self.grid_size = tuple(grid_size)
        self.lambda_delta = lambda_delta
        self.lambda_speckle = lambda_speckle
        self.lambda_gamma = lambda_gamma
        self.downsample_factor = downsample_factor

    def __call__(self, data):
        from octa_tpu.models import noise_model as nm

        if self.rng.py.random() < self.prob:
            for k in self._iter_keys(data):
                img = _to_jax(data[k]).astype(jnp.float32)  # [C,H,W]
                bg = _to_jax(data["background"]).astype(jnp.float32)
                params = nm.sample_noise_params(
                    self.rng.next_key(), img.shape[0], self.grid_size)
                out = nm.apply_noise_model(
                    params, self.rng.next_key(), img, bg[: img.shape[0]],
                    self.lambda_delta, self.lambda_speckle, self.lambda_gamma,
                    self.downsample_factor)
                data[k] = jax.lax.stop_gradient(out)
        return data


class RandomDecreaseResolutiond(Transform):
    def __init__(self, keys, p=1.0, max_factor=0.25, **kw):
        super().__init__(keys, True)
        self.p, self.max_factor = p, max_factor

    def __call__(self, data):
        if self.rng.py.random() < self.p:
            for k in self._iter_keys(data):
                x = _to_jax(data[k]).astype(jnp.float32)
                factor = self.rng.py.uniform(self.max_factor, 1.0)
                data[k] = jax.vmap(F.decrease_resolution, in_axes=(0, None, None))(
                    x, jnp.float32(factor), self.max_factor)
        return data


class AddLineArtifact(Transform):
    def __call__(self, data):
        for k in self._iter_keys(data):
            x = _to_jax(data[k]).astype(jnp.float32)
            data[k] = jax.vmap(F.add_line_artifact, in_axes=(0, None))(
                x, self.rng.next_key())
        return data


class SpeckleBrightnesd(Transform):
    def __call__(self, data):
        for k in self._iter_keys(data):
            x = _to_jax(data[k]).astype(jnp.float32)
            data[k] = jax.vmap(F.speckle_brightness, in_axes=(0, None))(
                x, self.rng.next_key())
        return data


class BinomialVesselNoised(Transform):
    """Binomial vessel-like noise + radial attenuation + quantum noise
    (``data_transforms.py:44-102``), vectorized (the reference uses a Python
    double loop over pixels)."""

    def __init__(self, keys, allow_missing_keys=False, vessel_noise_scaling=0.5,
                 vessel_noise_blur=1.0, r=48, **kw):
        super().__init__(keys, allow_missing_keys)
        self.scaling = vessel_noise_scaling
        self.blur = vessel_noise_blur
        self.r = r

    def __call__(self, data):
        from octa_tpu.ops.morphology import binary_dilation

        for k in self._iter_keys(data):
            x = _to_jax(data[k]).astype(jnp.float32)
            shape = x.shape[-2:]
            key1, key2 = jax.random.split(self.rng.next_key())
            noise = (jax.random.uniform(key1, shape) < 0.1).astype(jnp.float32)
            noise = binary_dilation(noise[None], 1, connectivity=2)[0]
            yy, xx = jnp.meshgrid(jnp.arange(shape[0]), jnp.arange(shape[1]),
                                  indexing="ij")
            dist = jnp.sqrt((yy - shape[0] / 2) ** 2 + (xx - shape[1] / 2) ** 2)
            for dr in [0, 3, 6, 9, 12]:
                noise = jnp.where(dist < self.r - dr, noise * 0.7, noise)
            noise = F.gaussian_blur(noise, self.blur) * self.scaling
            quantum = jax.random.uniform(key2, shape) * 0.2
            out = jnp.clip((x + noise + quantum) / (1.0 + self.scaling / 1.5),
                           0.0, 1.0)
            data[k] = out
        return data


class AddVitreousFloater(Transform):
    """Random-walk polyline shadow artifact (``data_transforms.py:104-185``).
    The polyline + dilation is host-side (tiny), the blur/shadow on device."""

    def __init__(self, keys, allow_missing_keys=False, floater_chance=0.1,
                 floater_opacity_interval=(0.5, 1.0),
                 floater_segments_interval=(10, 20),
                 dilations_interval=(10, 30), **kw):
        super().__init__(keys, allow_missing_keys)
        self.chance = floater_chance
        self.opacity = floater_opacity_interval
        self.segments = floater_segments_interval
        self.dilations = dilations_interval

    def _line(self, p0, p1, shape):
        n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]))) + 1
        rr = np.linspace(p0[0], p1[0], n).round().astype(int)
        cc = np.linspace(p0[1], p1[1], n).round().astype(int)
        ok = (rr >= 0) & (rr < shape[0]) & (cc >= 0) & (cc < shape[1])
        return rr[ok], cc[ok]

    def __call__(self, data):
        from scipy.ndimage import binary_dilation as nd_dilate

        g = self.rng.np
        if g.random() < self.chance:
            for k in self._iter_keys(data):
                x = _to_jax(data[k]).astype(jnp.float32)
                h, w = x.shape[-2:]
                floater = np.zeros((h, w), np.float32)
                cur = np.array([g.integers(0, h), g.integers(0, w)])
                opacity = g.uniform(*self.opacity)
                for _ in range(int(g.integers(*self.segments))):
                    nxt = cur + np.array([int(g.normal(scale=h / 10)),
                                          int(g.normal(scale=w / 10))])
                    rr, cc = self._line(cur, nxt, (h, w))
                    floater[rr, cc] = opacity
                    cur = nxt
                floater = nd_dilate(
                    floater > 0, iterations=int(g.integers(*self.dilations))
                ).astype(np.float32)
                fl = F.gaussian_blur(jnp.asarray(floater), 10.0)
                data[k] = x * (1 - fl)
        return data


class AddMotionArtifact(Transform):
    """Shear/stretch/buckle/whiteout row artifacts applied consistently to
    the 4x-resolution label (``data_transforms.py:187-302``). Host numpy
    (data-dependent row slicing)."""

    def __init__(self, img_key, gt_key, artifacts=None, grace_margin=10,
                 max_shear=5, max_stretch=5, max_buckle=5, max_whiteout=1,
                 no_h_cuts=3, **kw):
        super().__init__([img_key, gt_key], False)
        self.img_key, self.gt_key = img_key, gt_key
        self.artifacts = artifacts or {
            "shear": 0.3, "stretch": 0.3, "buckle": 0.3, "whiteout": 0.1}
        self.grace_margin = grace_margin
        self.max_shear = max_shear
        self.max_stretch = max_stretch
        self.max_buckle = max_buckle
        self.max_whiteout = max_whiteout
        self.no_h_cuts = no_h_cuts

    def __call__(self, data):
        g = self.rng.np
        img = np.asarray(_to_np(data[self.img_key])).copy()
        gt = np.asarray(_to_np(data[self.gt_key])).copy()
        ishape, gshape = img.shape, gt.shape
        img, gt = img.squeeze(), gt.squeeze()
        for _ in range(int(g.integers(0, self.no_h_cuts))):
            t_img, t_gt = img.copy(), gt.copy()
            names = list(self.artifacts)
            probs = np.array([self.artifacts[n] for n in names])
            art = g.choice(names, p=probs / probs.sum())
            pos = int(g.integers(self.grace_margin, img.shape[0] - self.grace_margin))
            if art == "shear":
                s = int(g.integers(0, self.max_shear + 1))
                img[pos:, :] = np.roll(t_img[pos:, :], s, axis=1)
                img[pos:, :s] = 0
                gt[4 * pos:, :] = np.roll(t_gt[4 * pos:, :], 4 * s, axis=1)
                gt[4 * pos:, :4 * s] = 0
            elif art == "stretch":
                s = int(g.integers(1, self.max_stretch + 1))
                img[pos:pos + s, :] = t_img[pos, :]
                img[pos + s:, :] = t_img[pos:-s, :]
                gt[4 * pos:4 * pos + 4 * s, :] = t_gt[4 * pos, :]
                gt[4 * pos + 4 * s:, :] = t_gt[4 * pos:-4 * s, :]
            elif art == "buckle":
                s = int(g.integers(1, self.max_buckle + 1))
                img[pos:, :] = t_img[pos - s:-s, :]
                gt[4 * pos:, :] = t_gt[4 * pos - 4 * s:-4 * s, :]
            elif art == "whiteout":
                s = int(g.integers(1, self.max_whiteout + 1))
                img[pos:pos + s, :] = g.uniform(0.5, 1.0, (s, img.shape[1]))
        data[self.img_key] = img.reshape(ishape)
        data[self.gt_key] = gt.reshape(gshape)
        return data


class MentenAugmentationd(Transform):
    """MICCAI-2022 baseline augmentation chain (``data_transforms.py:304-325``)."""

    def __init__(self, img_key, gt_key, **kw):
        super().__init__([img_key, gt_key], False)
        self.binomial = BinomialVesselNoised([img_key], allow_missing_keys=True)
        self.floater = AddVitreousFloater([img_key], allow_missing_keys=True)
        self.motion = AddMotionArtifact(img_key, gt_key)

    def set_rng(self, rng):
        super().set_rng(rng)
        for t in (self.binomial, self.floater, self.motion):
            t.set_rng(rng)

    def __call__(self, data):
        return self.motion(self.floater(self.binomial(data)))


class ImageToImageTranslationd(Transform):
    """Frozen pretrained generator applied inside the pipeline
    (``data_transforms.py:327-356``). Runs jitted on device."""

    def __init__(self, model_path, keys, model_config=None,
                 allow_missing_keys=False, **kw):
        super().__init__(keys, allow_missing_keys)
        from octa_tpu.io.checkpoints import load_network_for_inference

        self.apply_fn = load_network_for_inference(model_path, model_config)

    def __call__(self, data):
        for k in self._iter_keys(data):
            img = _to_jax(data[k]).astype(jnp.float32)  # [C,H,W]
            nhwc = img[None].transpose(0, 2, 3, 1)
            out = self.apply_fn(nhwc)
            data[k] = jax.lax.stop_gradient(out[0].transpose(2, 0, 1))
        return data


class RemoveOuterNoise(Transform):
    """Keep components connected to the central z-plane (3D recon post,
    ``data_transforms.py:418-432``). Single-tensor transform."""

    def __init__(self, z_axis=0, **kw):
        super().__init__(())
        self.z_axis = z_axis

    def __call__(self, volume):
        from octa_tpu.ops.morphology import keep_largest_connected_component

        vol = np.asarray(volume) > 0
        tmp = vol.copy()
        idx = [slice(None)] * tmp.ndim
        idx[self.z_axis] = tmp.shape[self.z_axis] // 2
        tmp[tuple(idx)] = True
        tmp = keep_largest_connected_component(tmp.astype(np.uint8)) > 0
        return np.logical_and(vol, tmp)


# ---------------------------------------------------------------------------
# Post-processing (single-tensor) transforms
# ---------------------------------------------------------------------------

class Activations:
    def __init__(self, sigmoid=False, softmax=False, **kw):
        self.sigmoid, self.softmax = sigmoid, softmax

    def __call__(self, x):
        x = _to_jax(x)
        if self.sigmoid:
            return jax.nn.sigmoid(x)
        if self.softmax:
            return jax.nn.softmax(x, axis=0)
        return x


class AsDiscrete:
    def __init__(self, threshold=None, **kw):
        self.threshold = threshold

    def __call__(self, x):
        x = _to_jax(x)
        return (x >= self.threshold).astype(jnp.float32)


class RemoveSmallObjects:
    def __init__(self, min_size=64, connectivity=1, **kw):
        self.min_size = min_size
        self.connectivity = connectivity

    def __call__(self, x):
        from octa_tpu.ops.morphology import remove_small_objects

        arr = np.asarray(x)
        out = np.stack([
            remove_small_objects(arr[c], self.min_size, self.connectivity)
            for c in range(arr.shape[0])
        ]) if arr.ndim == 3 else remove_small_objects(arr, self.min_size,
                                                      self.connectivity)
        return out.astype(np.float32)


class CastToType:
    _MAP = CastToTyped._MAP

    def __init__(self, dtype="float32", **kw):
        self.dtype = self._MAP.get(str(dtype), dtype)

    def __call__(self, x):
        if isinstance(x, jax.Array):
            return np.asarray(x).astype(self.dtype)
        return _to_np(x).astype(self.dtype)


class Lambda:
    """Guarded Lambda: only identity-style expressions are evaluated, the
    reference's arbitrary ``eval`` escape hatch (``data_transforms.py:605``)
    is intentionally not reproduced."""

    def __init__(self, func="lambda x: x", **kw):
        if not str(func).replace(" ", "").startswith("lambdax:"):
            raise ValueError("Lambda transforms must be 'lambda x: <expr>'")
        self.func = eval(func, {"__builtins__": {}}, {"np": np, "jnp": jnp})

    def __call__(self, x):
        return self.func(x)


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, data):
        for t in self.transforms:
            data = t(data)
        return data


TRANSFORM_REGISTRY = {
    c.__name__: c for c in [
        LoadImaged, ToGrayScaled, LoadGraphAndFilterByRandomRadiusd,
        EnsureChannelFirstd, AsChannelLast, CastToTyped, SelectSlice,
        ScaleIntensityd, Resized, Resize, AsDiscreted, RandFlipd, Flipd,
        RandRotate90d, Rotate90d, RandRotated, RandCropOrPadd,
        AddRandomBackgroundNoised, NoiseModeld, RandomDecreaseResolutiond,
        AddLineArtifact, SpeckleBrightnesd, BinomialVesselNoised,
        AddVitreousFloater, AddMotionArtifact, MentenAugmentationd,
        ImageToImageTranslationd, RemoveOuterNoise,
        Activations, AsDiscrete, RemoveSmallObjects, CastToType, Lambda,
    ]
}


def get_data_augmentations(aug_config, seed: int, dtype=np.float32,
                           rng: RngPool | None = None):
    """Build the transform list from config (reference
    ``get_data_augmentations``, ``data_transforms.py:587-611``)."""
    if aug_config is None:
        return []
    rng = rng or RngPool(seed)
    out = []
    for entry in aug_config:
        entry = dict(entry)
        name = entry.pop("name")
        if name not in TRANSFORM_REGISTRY:
            # The reference falls through to all of monai.transforms via
            # globals() (``data_transforms.py:11,594``); this rebuild
            # implements the names the shipped config corpus uses, and —
            # when MONAI happens to be installed — dispatches unknown
            # names to it the same way, so user-authored configs with
            # arbitrary MONAI transforms keep working. Without MONAI,
            # fail loudly instead of at first use.
            monai_cls = None
            try:  # optional dependency; absent in this image
                import monai.transforms as _mt
                monai_cls = getattr(_mt, name, None)
            except ImportError:
                pass
            if monai_cls is None:
                raise KeyError(
                    f"transform '{name}' is not implemented in octa_tpu "
                    "and MONAI is not installed. Supported transforms: "
                    + ", ".join(sorted(TRANSFORM_REGISTRY)) + ". "
                    "(The reference additionally dispatches arbitrary "
                    "monai.transforms names; installing MONAI restores "
                    "that fallthrough here.)")
            out.append(monai_cls(**entry))
            continue
        cls = TRANSFORM_REGISTRY[name]
        if name.startswith("CastToType"):
            dts = entry.get("dtype", "float32")
            islist = isinstance(dts, list)
            dts = dts if islist else [dts]
            dts = [dtype if d == "dtype" else d for d in dts]
            entry["dtype"] = dts if islist else dts[0]
        t = cls(**entry)
        if isinstance(t, Transform):
            t.set_rng(rng)
        out.append(t)
    return out
