"""CycleGAN/CUT-family networks in Flax (NHWC, TPU-native).

Re-implementations of the reference's network zoo
(``models/networks.py:350-506``): antialiased ResnetGenerator with sigmoid
head and ``encode_only`` feature taps, 70x70 PatchGAN discriminator,
PatchSampleF MLP patch projector, and NEGCUT's Negative_Generator.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from octa_tpu.models.layers import (
    BlurDownsample,
    BlurUpsample,
    InstanceNorm,
    kaiming,
    l2_normalize,
    reflect_pad,
)


class ResnetBlock(nn.Module):
    """Reflect-padded residual block (``networks.py:291-348``)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = reflect_pad(x, 1)
        h = nn.Conv(self.dim, (3, 3), padding="VALID", use_bias=True,
                    kernel_init=kaiming, dtype=self.dtype, name="conv1")(h)
        h = InstanceNorm(name="norm1")(h)
        h = nn.relu(h)
        h = reflect_pad(h, 1)
        h = nn.Conv(self.dim, (3, 3), padding="VALID", use_bias=True,
                    kernel_init=kaiming, dtype=self.dtype, name="conv2")(h)
        h = InstanceNorm(name="norm2")(h)
        return x + h


class ResnetGenerator(nn.Module):
    """Antialiased ResNet generator (``networks.py:350-443``).

    Layer sequence matches the reference's ``nn.Sequential`` ordering so that
    ``layers=[...]`` feature-tap indices used by CUT configs line up:
      0 pad, 1 conv7, 2 norm, 3 relu,
      4/8 conv3 s1, 5/9 norm, 6/10 relu, 7/11 blur-down,
      12..20 resblocks,
      21/25 blur-up, 22/26 conv3, 23/27 norm, 24/28 relu,
      29 pad, 30 conv7, 31 sigmoid.
    """

    input_nc: int = 1
    output_nc: int = 1
    ngf: int = 64
    n_blocks: int = 9
    dtype: jnp.dtype = jnp.float32

    def _stages(self):
        """Yield (layer_id, fn) pairs replicating the Sequential indices."""
        raise NotImplementedError

    @nn.compact
    def __call__(self, x, layers: Sequence[int] | None = None,
                 encode_only: bool = False):
        taps = list(layers) if layers else []
        feats = []
        layer_id = 0

        def tap(h):
            nonlocal layer_id
            if layer_id in taps:
                feats.append(h)
            done = encode_only and taps and layer_id == taps[-1]
            layer_id += 1
            return done

        ngf = self.ngf
        h = reflect_pad(x, 3)
        if tap(h):
            return feats
        h = nn.Conv(ngf, (7, 7), padding="VALID", use_bias=True,
                    kernel_init=kaiming, dtype=self.dtype, name="conv_in")(h)
        if tap(h):
            return feats
        h = InstanceNorm(name="norm_in")(h)
        if tap(h):
            return feats
        h = nn.relu(h)
        if tap(h):
            return feats

        for i in range(2):  # downsampling
            mult = 2 ** i
            h = nn.Conv(ngf * mult * 2, (3, 3), padding="SAME", use_bias=True,
                        kernel_init=kaiming, dtype=self.dtype,
                        name=f"down_conv_{i}")(h)
            if tap(h):
                return feats
            h = InstanceNorm(name=f"down_norm_{i}")(h)
            if tap(h):
                return feats
            h = nn.relu(h)
            if tap(h):
                return feats
            h = BlurDownsample(name=f"down_blur_{i}")(h)
            if tap(h):
                return feats

        for i in range(self.n_blocks):
            h = ResnetBlock(ngf * 4, dtype=self.dtype, name=f"resblock_{i}")(h)
            if tap(h):
                return feats

        for i in range(2):  # upsampling
            mult = 2 ** (2 - i)
            h = BlurUpsample(name=f"up_blur_{i}")(h)
            if tap(h):
                return feats
            h = nn.Conv(ngf * mult // 2, (3, 3), padding="SAME", use_bias=True,
                        kernel_init=kaiming, dtype=self.dtype,
                        name=f"up_conv_{i}")(h)
            if tap(h):
                return feats
            h = InstanceNorm(name=f"up_norm_{i}")(h)
            if tap(h):
                return feats
            h = nn.relu(h)
            if tap(h):
                return feats

        h = reflect_pad(h, 3)
        if tap(h):
            return feats
        h = nn.Conv(self.output_nc, (7, 7), padding="VALID", use_bias=True,
                    kernel_init=kaiming, dtype=self.dtype, name="conv_out")(h)
        if tap(h):
            return feats
        h = nn.sigmoid(h.astype(jnp.float32))
        if tap(h):
            return feats
        if layers:
            return h, feats
        return h


class NLayerDiscriminator(nn.Module):
    """Antialiased 70x70 PatchGAN (``networks.py:445-500``)."""

    input_nc: int = 1
    ndf: int = 64
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # torch Conv2d(k=4, s=1, p=1) crops one pixel: replicate with manual pad
        def conv4(h, feats, use_bias, name):
            h = jnp.pad(h, [(0, 0), (1, 1), (1, 1), (0, 0)])
            return nn.Conv(feats, (4, 4), padding="VALID", use_bias=use_bias,
                           kernel_init=kaiming, dtype=self.dtype, name=name)(h)

        h = conv4(x, self.ndf, True, "conv0")
        h = nn.leaky_relu(h, 0.2)
        h = BlurDownsample(name="blur0")(h)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            h = conv4(h, self.ndf * nf_mult, True, f"conv{n}")
            h = InstanceNorm(name=f"norm{n}")(h)
            h = nn.leaky_relu(h, 0.2)
            h = BlurDownsample(name=f"blur{n}")(h)
        nf_mult = min(2 ** self.n_layers, 8)
        h = conv4(h, self.ndf * nf_mult, True, f"conv{self.n_layers}")
        h = InstanceNorm(name=f"norm{self.n_layers}")(h)
        h = nn.leaky_relu(h, 0.2)
        h = conv4(h, 1, True, "conv_out")
        return h.astype(jnp.float32)


def resnetGenerator9(**kw):
    return ResnetGenerator(input_nc=1, output_nc=1, ngf=64, n_blocks=9, **kw)


def patchGAN70x70(**kw):
    return NLayerDiscriminator(input_nc=1, ndf=64, n_layers=3, **kw)


class PatchSampleF(nn.Module):
    """MLP patch projector for PatchNCE (``networks.py:905-955``).

    Apply per feature level: ``__call__(feat, patch_ids, level)`` gathers
    ``num_patches`` spatial positions, projects through a 2-layer MLP and
    L2-normalizes. Patch ids are supplied by the caller (shared between the
    query and key passes, like the reference).
    """

    nc: int = 256
    use_mlp: bool = True
    num_levels: int = 5

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array],
                 patch_ids: Sequence[jax.Array] | None,
                 num_patches: int = 256):
        out_feats, out_ids = [], []
        for level, feat in enumerate(feats):
            b, h, w, c = feat.shape
            flat = feat.reshape(b, h * w, c)
            if num_patches > 0:
                ids = patch_ids[level]
                sample = jnp.take(flat, ids, axis=1).reshape(-1, c)
            else:
                ids = None
                sample = flat.reshape(-1, c)
            if self.use_mlp:
                sample = nn.Dense(self.nc, kernel_init=kaiming,
                                  name=f"mlp_{level}_0")(sample)
                sample = nn.relu(sample)
                sample = nn.Dense(self.nc, kernel_init=kaiming,
                                  name=f"mlp_{level}_1")(sample)
            sample = l2_normalize(sample)
            if num_patches == 0:
                sample = sample.reshape(b, h, w, -1)
            out_feats.append(sample)
            out_ids.append(ids)
        return out_feats, out_ids


class NegativeGenerator(nn.Module):
    """NEGCUT adversarial negative-sample generator (``networks.py:960-1006``)."""

    num_patches: int = 256
    nc: int = 256
    z_dim: int = 64
    num_levels: int = 5

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], num_patches: int,
                 rng: jax.Array):
        out = []
        for level, feat in enumerate(feats):
            b = feat.shape[0]
            rng, sub = jax.random.split(rng)
            noise = jax.random.normal(sub, (b, num_patches, self.z_dim))
            pooled = jnp.mean(feat, axis=(1, 2))  # [b, c]
            pooled = jnp.repeat(pooled[:, None, :], num_patches, axis=1)
            inp = jnp.concatenate([pooled, noise], axis=-1).reshape(
                b * num_patches, -1
            )
            h = nn.Dense(self.nc, kernel_init=kaiming, name=f"mlp_{level}_0")(inp)
            h = nn.relu(h)
            h = nn.Dense(self.nc, kernel_init=kaiming, name=f"mlp_{level}_1")(h)
            out.append(l2_normalize(h))
        return out
