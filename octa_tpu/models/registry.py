"""Network registry (mirrors the reference ``MODEL_DICT``,
``models/networks.py:1009-1026``) so that config ``General.model.name``
entries resolve unchanged. Values are constructors taking the remaining
config keys as kwargs:

- Flax modules for trainable networks,
- callables for the parameterless classical baselines,
- training-algorithm classes (GanSegModel, CycleGAN, ...) are resolved by
  ``octa_tpu.train.algorithms`` — this registry exposes their names so
  ``define_model`` can dispatch.
"""
from __future__ import annotations

from octa_tpu.models.dynunet import DynUNet
from octa_tpu.models.nice_gan_nets import NiceDiscriminator, NiceResnetGenerator
from octa_tpu.models.resnet_gan import (
    NegativeGenerator,
    NLayerDiscriminator,
    PatchSampleF,
    ResnetGenerator,
    patchGAN70x70,
    resnetGenerator9,
)

# Names of algorithm-level "models" (multi-network training procedures);
# resolved in octa_tpu.train.algorithms.
ALGORITHM_NAMES = (
    "GanSegModel",
    "CycleGAN",
    "CUTModel",
    "NEGCUTModel",
    "DCLGAN",
    "NiceGAN",
)


def _frangi_ctor(**kw):
    from octa_tpu.ops.filters import frangi

    def run(img):  # [B, C, H, W] -> [B, C, H, W]
        out = frangi(img[:, 0], **kw)
        return out[:, None]

    return run


def _oof_ctor(**kw):
    import functools

    import jax
    import jax.numpy as jnp

    from octa_tpu.ops.filters import oof

    # Batched: the reference asserts batch==1 (``models/oof.py:37``); we
    # vmap the per-image FFT filter over the batch and apply the
    # reference's per-image normalization (``oof.py:40-41``) per sample.
    batched = jax.jit(jax.vmap(functools.partial(oof, **kw)))

    def run(img):  # [B, C, H, W] -> [B, C, H, W]
        out = batched(img[:, 0] * 255.0)
        mx = jnp.max(out, axis=(1, 2), keepdims=True)
        out = out + mx
        out = out / jnp.max(out, axis=(1, 2), keepdims=True)
        return out[:, None]

    return run


def _skrgan_ctor(**kw):
    from octa_tpu.ops.filters import skrgan_sketch
    import numpy as np

    def run(img):
        out = skrgan_sketch(np.asarray(img), **kw)
        return out[None, None]

    return run


NETWORK_DICT = {
    "DynUNet": DynUNet,
    "resnetGenerator9": resnetGenerator9,
    "patchGAN70x70": patchGAN70x70,
    "ResnetGenerator": ResnetGenerator,
    "NLayerDiscriminator": NLayerDiscriminator,
    "NiceResnetGenerator": NiceResnetGenerator,
    "NiceDiscriminator": NiceDiscriminator,
    "PatchSamplerF": PatchSampleF,  # reference registry spelling
    "PatchSampleF": PatchSampleF,
    "Negative_Generator": NegativeGenerator,
    "oof": _oof_ctor,
    "frangi": _frangi_ctor,
    "skrgan": _skrgan_ctor,
}

MODEL_DICT = dict(NETWORK_DICT)
for _name in ALGORITHM_NAMES:
    MODEL_DICT[_name] = _name  # placeholder; resolved by define_model


def build_network(model_config: dict, **extra):
    """Construct a Flax network (or callable baseline) from a config dict
    with a ``name`` key; remaining keys become constructor kwargs
    (reference ``define_model`` pattern, ``models/model.py:7-18``)."""
    cfg = dict(model_config)
    name = cfg.pop("name")
    ctor = NETWORK_DICT[name]
    cfg.update(extra)
    return ctor(**cfg)
