"""NICE-GAN networks in Flax (reference ``models/networks.py:525-880``):
decoder-style generator with adaILN conditioning and a reuse-the-encoder
discriminator with CAM attention and two multi-scale heads.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from octa_tpu.models.layers import (
    LayerInstanceNorm,
    SpectralNormConv,
    kaiming,
    reflect_pad,
)


class ResnetAdaILNBlock(nn.Module):
    """Residual block with adaptive ILN (``networks.py:595-616``)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, gamma, beta):
        h = reflect_pad(x, 1)
        h = nn.Conv(self.dim, (3, 3), padding="VALID", use_bias=False,
                    kernel_init=kaiming, dtype=self.dtype, name="conv1")(h)
        h = LayerInstanceNorm(rho_init=(3.2, 1.0), affine=False, name="norm1")(
            h, gamma, beta)
        h = nn.relu(h)
        h = reflect_pad(h, 1)
        h = nn.Conv(self.dim, (3, 3), padding="VALID", use_bias=False,
                    kernel_init=kaiming, dtype=self.dtype, name="conv2")(h)
        h = LayerInstanceNorm(rho_init=(3.2, 1.0), affine=False, name="norm2")(
            h, gamma, beta)
        return x + h


def pixel_shuffle(x, factor: int = 2):
    """NHWC pixel shuffle: [B,H,W,C*f^2] -> [B,H*f,W*f,C]."""
    b, h, w, c = x.shape
    co = c // (factor * factor)
    x = x.reshape(b, h, w, factor, factor, co)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * factor, w * factor, co)


class NiceResnetGenerator(nn.Module):
    """Decoder generator; input is the discriminator-encoder feature ``z``
    (``networks.py:693-778``)."""

    input_nc: int = 1
    output_nc: int = 1
    ngf: int = 64
    n_blocks: int = 6
    img_size: int = 304
    light: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        mult = 4
        ngf = self.ngf
        h = reflect_pad(z, 1)
        h = nn.Conv(ngf * mult, (3, 3), padding="VALID", use_bias=True,
                    kernel_init=kaiming, dtype=self.dtype, name="up0_conv")(h)
        h = LayerInstanceNorm(rho_init=(1.0, 3.2), name="up0_iln")(h)
        h = nn.relu(h)

        if self.light:
            pooled = jnp.mean(h, axis=(1, 2))
        else:
            pooled = h.reshape(h.shape[0], -1)
        fc = nn.Dense(ngf * mult, use_bias=False, kernel_init=kaiming,
                      name="fc0")(pooled)
        fc = nn.relu(fc)
        fc = nn.Dense(ngf * mult, use_bias=False, kernel_init=kaiming,
                      name="fc1")(fc)
        fc = nn.relu(fc)
        gamma = nn.Dense(ngf * mult, use_bias=False, kernel_init=kaiming,
                         name="gamma")(fc)
        beta = nn.Dense(ngf * mult, use_bias=False, kernel_init=kaiming,
                        name="beta")(fc)

        for i in range(self.n_blocks):
            h = ResnetAdaILNBlock(ngf * mult, dtype=self.dtype,
                                  name=f"upblock1_{i}")(h, gamma, beta)

        for i in range(2):
            m = 2 ** (2 - i)
            h = reflect_pad(h, 1)
            h = nn.Conv(ngf * m // 2, (3, 3), padding="VALID", use_bias=False,
                        kernel_init=kaiming, dtype=self.dtype,
                        name=f"up2_conv_{i}")(h)
            h = LayerInstanceNorm(rho_init=(1.0, 3.2), name=f"up2_iln_{i}a")(h)
            h = nn.relu(h)
            h = nn.Conv(ngf * m // 2 * 4, (1, 1), use_bias=True,
                        kernel_init=kaiming, dtype=self.dtype,
                        name=f"up2_sub_{i}")(h)
            h = pixel_shuffle(h, 2)
            h = LayerInstanceNorm(rho_init=(1.0, 3.2), name=f"up2_iln_{i}b")(h)
            h = nn.relu(h)

        h = reflect_pad(h, 3)
        h = nn.Conv(self.output_nc, (7, 7), padding="VALID", use_bias=False,
                    kernel_init=kaiming, dtype=self.dtype, name="conv_out")(h)
        return nn.sigmoid(h.astype(jnp.float32))


class NiceDiscriminator(nn.Module):
    """Discriminator whose trunk doubles as the translation encoder
    (``networks.py:780-880``). Returns (out0, out1, cam_logit, heatmap, z)."""

    input_nc: int = 1
    ndf: int = 64
    n_layers: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ndf = self.ndf

        def snconv(h, feats, stride, name, use_bias=True):
            h = reflect_pad(h, 1)
            return SpectralNormConv(feats, (4, 4), (stride, stride),
                                    use_bias=use_bias, name=name)(h)

        h = snconv(x, ndf, 2, "enc0")
        h = nn.leaky_relu(h, 0.2)
        h = snconv(h, ndf * 2, 2, "enc1")
        h = nn.leaky_relu(h, 0.2)

        x_0 = h
        gap = jnp.mean(h, axis=(1, 2))
        gmp = jnp.max(h, axis=(1, 2))
        cam_in = jnp.concatenate([gap, gmp], axis=-1)  # [B, 4*ndf]
        # spectral-normed CAM fc; the raw (unnormalized) weight reweights the
        # doubled feature map, as in the reference (networks.py:857-859)
        cam_kernel = self.param("cam_fc_kernel", kaiming, (4 * ndf, 1))
        sigma = jnp.linalg.norm(cam_kernel) + 1e-12  # rank-1: sigma == ||w||
        cam_logit = cam_in @ (cam_kernel / sigma)
        h2 = jnp.concatenate([h, h], axis=-1) * cam_kernel[:, 0]
        h2 = nn.Conv(ndf * 2, (1, 1), use_bias=True, kernel_init=kaiming,
                     dtype=self.dtype, name="conv1x1")(h2)
        lamda = self.param("lamda", nn.initializers.zeros, (1,))
        h = lamda * h2 + x_0
        h = nn.leaky_relu(h, 0.2)
        heatmap = jnp.sum(h, axis=-1, keepdims=True)
        z = h

        # head 0 (local, ~70x70 receptive field)
        h0 = snconv(h, ndf * 4, 2, "dis0_0")
        h0 = nn.leaky_relu(h0, 0.2)
        h1in = h0
        h0 = snconv(h0, ndf * 8, 1, "dis0_1")
        h0 = nn.leaky_relu(h0, 0.2)
        h0 = reflect_pad(h0, 1)
        out0 = SpectralNormConv(1, (4, 4), (1, 1), use_bias=False,
                                name="conv0")(h0)

        # head 1 (global, ~286 receptive field)
        h1 = snconv(h1in, ndf * 8, 2, "dis1_0a")
        h1 = nn.leaky_relu(h1, 0.2)
        h1 = snconv(h1, ndf * 16, 2, "dis1_0b")
        h1 = nn.leaky_relu(h1, 0.2)
        h1 = snconv(h1, ndf * 32, 1, "dis1_1")
        h1 = nn.leaky_relu(h1, 0.2)
        h1 = reflect_pad(h1, 1)
        out1 = SpectralNormConv(1, (4, 4), (1, 1), use_bias=False,
                                name="conv1")(h1)

        return (out0.astype(jnp.float32), out1.astype(jnp.float32),
                cam_logit.astype(jnp.float32), heatmap, z)
