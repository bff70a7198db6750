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

Conv padding follows torch semantics (explicit k//2 per side): identical to
XLA 'SAME' at stride 1, but NOT at stride 2, where 'SAME' would shift the
sampling grid by one pixel vs torch's ``padding=1``.

TPU fast path — space-to-depth (S2D). XLA convs at large spatial dims with
few channels run far below MXU peak (measured ~5.5 TFLOP/s for 1216²x32ch
bf16 on v5e vs ~43 TFLOP/s for the equivalent 608²x128ch). When the input is
large (``>= s2d_threshold``), the full-resolution stages are evaluated
exactly in a 2x2 space-to-depth representation: activations [B,H/2,W/2,4C]
(phase-major channels p*C+c, p = (y%2)*2 + x%2) and on-the-fly transformed
kernels. All transforms are exact linear re-indexings of the canonical
parameters, so checkpoints, imports, and gradients are unchanged.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from octa_tpu.models.layers import InstanceNorm, kaiming

_DN = ("NHWC", "HWIO", "NHWC")


def default_filters(n: int) -> list[int]:
    return [min(2 ** (5 + i), 320) for i in range(n)]


# ---------------------------------------------------------------------------
# Space-to-depth helpers (exact, phase-major channel order p*C + c)
# ---------------------------------------------------------------------------

def space_to_depth(x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(y: jax.Array) -> jax.Array:
    b, h, w, c4 = y.shape
    c = c4 // 4
    y = y.reshape(b, h, w, 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * 2, w * 2, c)


def _s2d_weights_s1(w: jax.Array) -> jax.Array:
    """[3,3,Cin,Cout] stride-1 pad-1 conv -> [3,3,4Cin,4Cout] S2D conv
    (stride 1, pad 1). Exact: y_full[2i+a,2j+b] taps x_full[2i+a+dy,...]."""
    cin, cout = w.shape[2], w.shape[3]
    ws = jnp.zeros((3, 3, 4, cin, 4, cout), w.dtype)
    for a in range(2):
        for bb in range(2):
            for dy in range(-1, 2):
                for dx in range(-1, 2):
                    sy, sx = a + dy, bb + dx
                    by, ry = sy // 2, sy % 2
                    bx, rx = sx // 2, sx % 2
                    ws = ws.at[by + 1, bx + 1, ry * 2 + rx, :,
                               a * 2 + bb, :].add(w[dy + 1, dx + 1])
    return ws.reshape(3, 3, 4 * cin, 4 * cout)


def _s2d_weights_s2(w: jax.Array) -> jax.Array:
    """[3,3,Cin,Cout] stride-2 pad-1 conv -> [2,2,4Cin,Cout] stride-1 conv
    with padding ((1,0),(1,0)) on the S2D grid. y[i,j] taps x_full[2i+dy]."""
    cin, cout = w.shape[2], w.shape[3]
    ws = jnp.zeros((2, 2, 4, cin, cout), w.dtype)
    for dy in range(-1, 2):
        for dx in range(-1, 2):
            by, ry = dy // 2, dy % 2
            bx, rx = dx // 2, dx % 2
            ws = ws.at[by + 1, bx + 1, ry * 2 + rx, :, :].add(w[dy + 1, dx + 1])
    return ws.reshape(2, 2, 4 * cin, cout)


def _s2d_weights_transp(w: jax.Array) -> jax.Array:
    """flax ConvTranspose kernel [2,2,Cin,Cout] (transpose_kernel=False, i.e.
    spatially flipped vs torch) at stride 2 -> equivalent 1x1 conv
    [1,1,Cin,4Cout] producing S2D output: y_full[2i+a,2j+b] = x[i,j]@K[1-a,1-b].
    """
    cin, cout = w.shape[2], w.shape[3]
    kf = w[::-1, ::-1]                      # kf[a,b] = K[1-a,1-b]
    return kf.transpose(2, 0, 1, 3).reshape(1, 1, cin, 4 * cout)


def _s2d_weights_1x1(w: jax.Array) -> jax.Array:
    """[1,1,Cin,Cout] 1x1 conv -> [1,1,4Cin,4Cout] phase-block-diagonal."""
    cin, cout = w.shape[2], w.shape[3]
    eye = jnp.eye(4, dtype=w.dtype)
    ws = eye[:, None, :, None] * w[0, 0][None, :, None, :]  # [4,Cin,4,Cout]
    return ws.reshape(1, 1, 4 * cin, 4 * cout)


def s2d_concat(a: jax.Array, b: jax.Array) -> jax.Array:
    """Concat two phase-major S2D tensors so the result is phase-major over
    the concatenated canonical channels (order: a's channels then b's)."""
    sh = a.shape[:-1]
    ar = a.reshape(*sh, 4, a.shape[-1] // 4)
    br = b.reshape(*sh, 4, b.shape[-1] // 4)
    return jnp.concatenate([ar, br], axis=-1).reshape(
        *sh, a.shape[-1] + b.shape[-1])


class CanonConv(nn.Module):
    """Conv with canonical [k,k,Cin,Cout] parameters (named like nn.Conv so
    checkpoints/imports are layout-identical) and torch padding semantics;
    `mode` selects the direct evaluation or an exact S2D-domain evaluation.
    """

    features: int
    kernel_size: int
    stride: int = 1
    mode: str = "direct"  # direct | s2d | s2d_down | s2d_out
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    axis_name: str | None = None  # spatial-shard mesh axis (H sharded)

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel_size, self.stride
        cin = x.shape[-1] // (1 if self.mode == "direct" else 4)
        kernel = self.param("kernel", kaiming, (k, k, cin, self.features))
        kd = kernel.astype(self.dtype)
        xd = x.astype(self.dtype)
        # no preferred_element_type: a f32-accumulating conv breaks under
        # autodiff with bf16 operands (mixed-dtype cotangent convs); the MXU
        # accumulates bf16 convs in f32 internally regardless
        conv = functools.partial(
            jax.lax.conv_general_dilated, dimension_numbers=_DN)
        if self.axis_name is not None:
            if self.mode != "direct":
                raise ValueError("spatial sharding requires direct convs")
            if k > 1:
                from octa_tpu.parallel.spatial import halo_exchange
                xd = halo_exchange(xd, k // 2, k // 2, self.axis_name)
            y = conv(xd, kd, (s, s), [(0, 0), (k // 2, k // 2)])
        elif self.mode == "direct":
            y = conv(xd, kd, (s, s), [(k // 2, k // 2)] * 2)
        elif self.mode == "s2d":          # stride-1 k=3, S2D in/out
            y = conv(xd, _s2d_weights_s1(kd), (1, 1), [(1, 1), (1, 1)])
        elif self.mode == "s2d_down":     # stride-2 k=3, S2D in, direct out
            y = conv(xd, _s2d_weights_s2(kd), (1, 1), [(1, 0), (1, 0)])
        elif self.mode == "s2d_out":      # 1x1, S2D in/out
            y = conv(xd, _s2d_weights_1x1(kd), (1, 1), [(0, 0), (0, 0)])
        else:
            raise ValueError(self.mode)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            reps = y.shape[-1] // self.features
            y = y + jnp.tile(bias, reps).astype(y.dtype)
        return y.astype(self.dtype)


class UnetBasicBlock(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    negative_slope: float = 0.01
    dtype: jnp.dtype = jnp.float32
    # S2D plumbing: mode of each conv + phase-group factor of each norm
    conv1_mode: str = "direct"
    conv2_mode: str = "direct"
    norm1_groups: int = 1
    norm2_groups: int = 1
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel_size, self.stride
        x = CanonConv(self.features, k, s, mode=self.conv1_mode,
                      dtype=self.dtype, axis_name=self.axis_name,
                      name="conv1")(x)
        x = InstanceNorm(affine=True, groups=self.norm1_groups,
                         axis_name=self.axis_name, name="norm1")(x)
        x = nn.leaky_relu(x, self.negative_slope)
        x = CanonConv(self.features, k, 1, mode=self.conv2_mode,
                      dtype=self.dtype, axis_name=self.axis_name,
                      name="conv2")(x)
        x = InstanceNorm(affine=True, groups=self.norm2_groups,
                         axis_name=self.axis_name, name="norm2")(x)
        return nn.leaky_relu(x, self.negative_slope)


class UnetUpBlock(nn.Module):
    features: int
    kernel_size: int = 3
    up_stride: int = 2
    up_kernel: int = 2
    dtype: jnp.dtype = jnp.float32
    s2d: bool = False  # produce S2D output (skip must be S2D phase-major)
    axis_name: str | None = None  # k=s transp-convs tile shard-locally

    @nn.compact
    def __call__(self, x, skip):
        s = self.up_stride
        if self.s2d:
            if s != 2 or self.up_kernel != 2:
                raise ValueError("s2d up block requires k=s=2")
            # parameter path matches nn.ConvTranspose: transp_conv/kernel
            x = _S2DTransp(self.features, dtype=self.dtype,
                           name="transp_conv")(x)
            x = s2d_concat(x, skip)
            return UnetBasicBlock(
                self.features, self.kernel_size, 1, dtype=self.dtype,
                conv1_mode="s2d", conv2_mode="s2d",
                norm1_groups=4, norm2_groups=4, name="conv_block",
            )(x)
        if self.axis_name is not None and self.up_kernel > s:
            raise ValueError("spatial sharding needs k<=s transp-convs "
                             "(non-overlapping tiles)")
        x = nn.ConvTranspose(
            self.features, (self.up_kernel, self.up_kernel),
            strides=(s, s), padding="SAME", use_bias=False,
            kernel_init=kaiming, dtype=self.dtype, name="transp_conv",
        )(x)
        x = jnp.concatenate([x, skip], axis=-1)
        return UnetBasicBlock(
            self.features, self.kernel_size, 1, dtype=self.dtype,
            axis_name=self.axis_name, name="conv_block",
        )(x)


class _S2DTransp(nn.Module):
    """ConvTranspose(k=2,s=2) evaluated as a 1x1 conv with S2D output.
    Parameter named `kernel` with flax ConvTranspose layout [2,2,Cin,Cout]."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", kaiming, (2, 2, cin, self.features))
        w = _s2d_weights_transp(kernel.astype(self.dtype))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=_DN)
        return y.astype(self.dtype)


class DynUNet(nn.Module):
    """2D/3D dynamic U-Net. For 3D reconstruction configs the reference uses
    out_channels=44 on 2D inputs (``config_3d_recon_supervised.yml:6-13``),
    which maps here unchanged (channels = z-slabs).

    ``s2d_threshold``: inputs with H,W >= threshold run the full-resolution
    stages in the exact space-to-depth fast path (see module docstring).
    """

    spatial_dims: int = 2
    in_channels: int = 1
    out_channels: int = 1
    kernel_size: Sequence[int] = (3, 3, 3, 3, 3)
    strides: Sequence[int] = (1, 2, 2, 2, 1)
    upsample_kernel_size: Sequence[int] = (1, 2, 2, 2, 1)
    filters: Sequence[int] | None = None
    dtype: jnp.dtype = jnp.float32
    s2d_threshold: int = 1024
    #: gradient checkpointing: rematerialize each block's activations in the
    #: backward pass (jax.checkpoint). Cuts training-step HBM ~4x for the
    #: 1216² segmentor (the joint GAN-seg step OOMs at 26GB/16GB without it)
    #: at the cost of one extra forward per block.
    remat: bool = False
    #: spatial-sharding mesh axis: when set (see
    #: ``octa_tpu.parallel.spatial``), the H axis of the input is a shard of
    #: the global image; 3x3 convs halo-exchange one row over ICI and
    #: InstanceNorm psums its moments (matches the unsharded forward to
    #: float reduction-order tolerance).
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x):
        if self.spatial_dims != 2:
            raise NotImplementedError("only spatial_dims=2 is implemented")
        n = len(self.strides)
        f = list(self.filters) if self.filters else default_filters(n)
        ks = [k if isinstance(k, int) else k[0] for k in self.kernel_size]
        st = [s if isinstance(s, int) else s[0] for s in self.strides]

        Basic = nn.remat(UnetBasicBlock) if self.remat else UnetBasicBlock
        Up = nn.remat(UnetUpBlock) if self.remat else UnetUpBlock

        up_strides = list(st[1:])[::-1]
        upk = [k if isinstance(k, int) else k[0]
               for k in self.upsample_kernel_size][::-1]

        use_s2d = (
            self.axis_name is None
            and x.shape[1] >= self.s2d_threshold
            and x.shape[2] >= self.s2d_threshold
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
            and n >= 3 and st[0] == 1 and ks[0] == 3
            and st[1] == 2 and ks[1] == 3
            and up_strides[-1] == 2 and max(upk[-1], 2) == 2
        )

        skips = []
        if use_s2d:
            h = space_to_depth(x)
            h = Basic(
                f[0], ks[0], 1, dtype=self.dtype,
                conv1_mode="s2d", conv2_mode="s2d",
                norm1_groups=4, norm2_groups=4, name="input_block")(h)
            skips.append(h)  # S2D form; consumed by the S2D up block
            h = Basic(
                f[1], ks[1], st[1], dtype=self.dtype,
                conv1_mode="s2d_down", name="downsample_0")(h)
            skips.append(h)
            first_down = 2
        else:
            h = Basic(
                f[0], ks[0], st[0], dtype=self.dtype,
                axis_name=self.axis_name, name="input_block")(x)
            skips.append(h)
            first_down = 1

        for i in range(first_down, n - 1):
            h = Basic(
                f[i], ks[i], st[i], dtype=self.dtype,
                axis_name=self.axis_name, name=f"downsample_{i - 1}")(h)
            skips.append(h)
        h = Basic(
            f[-1], ks[-1], st[-1], dtype=self.dtype,
            axis_name=self.axis_name, name="bottleneck")(h)

        for j, i in enumerate(range(n - 1, 0, -1)):
            last = i - 1 == 0
            h = Up(
                f[i - 1], ks[i - 1], up_stride=up_strides[j],
                up_kernel=max(upk[j] if j < len(upk) else up_strides[j],
                              up_strides[j]),
                dtype=self.dtype, s2d=use_s2d and last,
                axis_name=self.axis_name, name=f"upsample_{j}",
            )(h, skips[i - 1])

        if use_s2d:
            out = CanonConv(
                self.out_channels, 1, mode="s2d_out", use_bias=True,
                dtype=self.dtype, name="output_block")(h)
            out = depth_to_space(out)
        else:
            out = CanonConv(
                self.out_channels, 1, mode="direct", use_bias=True,
                dtype=self.dtype, axis_name=self.axis_name,
                name="output_block")(h)
        return out.astype(jnp.float32)
