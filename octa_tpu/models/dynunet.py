"""DynUNet (nnU-Net style) in Flax, topology-compatible with MONAI's DynUNet
as configured by the reference (``models/networks.py:1009-1026`` registry entry,
``configs/config_gan_ves_seg.yml:13-20``: spatial_dims=2, kernel [3]*5,
strides [1,2,2,2,1], upsample_kernel_size [1,2,2,2,1]).

Topology (mirrors MONAI dynunet.py semantics so .pth imports map 1:1):
- filters[i] = min(2**(5+i), 320)
- input block  : BasicBlock(in,   f0, k0, s0)
- downsamples  : BasicBlock(fi-1, fi, ki, si)      for i in 1..n-2
- bottleneck   : BasicBlock(f-2,  f-1, k-1, s-1)
- upsamples    : UpBlock(fi, fi-1, ki-1, up_stride=si) for i = n-1..1
- output block : 1x1 conv (bias) to out_channels
BasicBlock = [conv(k,s,no-bias) + InstanceNorm(affine) + LeakyReLU(0.01)] x2.
UpBlock = transp-conv(stride, no-bias) -> concat skip -> BasicBlock(stride 1).

Layout is NHWC (TPU-native); convs run in the module dtype (bf16 under the
bf16 policy) with norm statistics in f32.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from octa_tpu.models.layers import InstanceNorm, kaiming


def default_filters(n: int) -> list[int]:
    return [min(2 ** (5 + i), 320) for i in range(n)]


class UnetBasicBlock(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    negative_slope: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel_size, self.stride
        x = nn.Conv(
            self.features, (k, k), strides=(s, s), padding="SAME",
            use_bias=False, kernel_init=kaiming, dtype=self.dtype,
            name="conv1",
        )(x)
        x = InstanceNorm(affine=True, name="norm1")(x)
        x = nn.leaky_relu(x, self.negative_slope)
        x = nn.Conv(
            self.features, (k, k), padding="SAME", use_bias=False,
            kernel_init=kaiming, dtype=self.dtype, name="conv2",
        )(x)
        x = InstanceNorm(affine=True, name="norm2")(x)
        return nn.leaky_relu(x, self.negative_slope)


class UnetUpBlock(nn.Module):
    features: int
    kernel_size: int = 3
    up_stride: int = 2
    up_kernel: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        s = self.up_stride
        x = nn.ConvTranspose(
            self.features, (self.up_kernel, self.up_kernel),
            strides=(s, s), padding="SAME", use_bias=False,
            kernel_init=kaiming, dtype=self.dtype, name="transp_conv",
        )(x)
        x = jnp.concatenate([x, skip], axis=-1)
        return UnetBasicBlock(
            self.features, self.kernel_size, 1, dtype=self.dtype,
            name="conv_block",
        )(x)


class DynUNet(nn.Module):
    """2D/3D dynamic U-Net. For 3D reconstruction configs the reference uses
    out_channels=44 on 2D inputs (``config_3d_recon_supervised.yml:6-13``),
    which maps here unchanged (channels = z-slabs)."""

    spatial_dims: int = 2
    in_channels: int = 1
    out_channels: int = 1
    kernel_size: Sequence[int] = (3, 3, 3, 3, 3)
    strides: Sequence[int] = (1, 2, 2, 2, 1)
    upsample_kernel_size: Sequence[int] = (1, 2, 2, 2, 1)
    filters: Sequence[int] | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.spatial_dims != 2:
            raise NotImplementedError("only spatial_dims=2 is implemented")
        n = len(self.strides)
        f = list(self.filters) if self.filters else default_filters(n)
        ks = [k if isinstance(k, int) else k[0] for k in self.kernel_size]
        st = [s if isinstance(s, int) else s[0] for s in self.strides]

        skips = []
        h = UnetBasicBlock(f[0], ks[0], st[0], dtype=self.dtype, name="input_block")(x)
        skips.append(h)
        for i in range(1, n - 1):
            h = UnetBasicBlock(
                f[i], ks[i], st[i], dtype=self.dtype, name=f"downsample_{i - 1}"
            )(h)
            skips.append(h)
        h = UnetBasicBlock(f[-1], ks[-1], st[-1], dtype=self.dtype, name="bottleneck")(h)

        up_strides = list(st[1:])[::-1]
        upk = [k if isinstance(k, int) else k[0] for k in self.upsample_kernel_size][::-1]
        for j, i in enumerate(range(n - 1, 0, -1)):
            h = UnetUpBlock(
                f[i - 1], ks[i - 1], up_stride=up_strides[j],
                up_kernel=max(upk[j] if j < len(upk) else up_strides[j], up_strides[j]),
                dtype=self.dtype, name=f"upsample_{j}",
            )(h, skips[i - 1])

        out = nn.Conv(
            self.out_channels, (1, 1), use_bias=True, kernel_init=kaiming,
            dtype=self.dtype, name="output_block",
        )(h)
        return out.astype(jnp.float32)
