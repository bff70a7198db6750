"""Shared Flax layers: norms, antialiased blur up/downsampling, padding.

TPU-first conventions:
- data layout NHWC (channels-last; XLA's preferred conv layout on TPU),
- bf16-friendly: norms compute statistics in float32,
- parameter initialization mirrors the reference's He/kaiming scheme
  (``models/networks.py:152-184``).
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

kaiming = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
normal002 = nn.initializers.normal(0.02)


class InstanceNorm(nn.Module):
    """Instance normalization over spatial dims (NHWC / NHWDC).

    ``affine=False`` matches torch's default used by the GAN networks
    (``get_norm_layer('instance')``, reference ``networks.py:236``);
    ``affine=True`` matches MONAI DynUNet's INSTANCE norm.
    """

    affine: bool = False
    eps: float = 1e-5
    groups: int = 1  # >1: channels are [groups, C] phase-major (S2D domain);
    # statistics and affine act per canonical channel C across groups.
    axis_name: str | None = None  # psum moments over a spatial-shard axis

    @nn.compact
    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        if self.axis_name is not None:
            if self.groups > 1:
                raise ValueError("sharded InstanceNorm: groups unsupported")
            axes = tuple(range(1, x.ndim - 1))
            cnt = 1.0
            for a in axes:
                cnt *= x.shape[a]
            n = cnt * jax.lax.axis_size(self.axis_name)
            # two-pass (mean first, then centered second moment): the
            # single-pass E[x²]-mean² form cancels catastrophically in f32
            # when |mean| >> std, diverging from the unsharded jnp.var path
            mean = jax.lax.psum(
                jnp.sum(x32, axis=axes, keepdims=True), self.axis_name) / n
            var = jax.lax.psum(
                jnp.sum((x32 - mean) ** 2, axis=axes, keepdims=True),
                self.axis_name) / n
            y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
            if self.affine:
                c = x.shape[-1]
                scale = self.param("scale", nn.initializers.ones, (c,))
                bias = self.param("bias", nn.initializers.zeros, (c,))
                y = y * scale + bias
            return y.astype(x.dtype)
        if self.groups > 1:
            c = x.shape[-1] // self.groups
            xg = x32.reshape(*x.shape[:-1], self.groups, c)
            axes = tuple(range(1, xg.ndim - 1))
            mean = jnp.mean(xg, axis=axes, keepdims=True)
            var = jnp.var(xg, axis=axes, keepdims=True)
            y = (xg - mean) * jax.lax.rsqrt(var + self.eps)
            if self.affine:
                scale = self.param("scale", nn.initializers.ones, (c,))
                bias = self.param("bias", nn.initializers.zeros, (c,))
                y = y * scale + bias
            return y.reshape(x.shape).astype(x.dtype)
        axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x32, axis=axes, keepdims=True)
        var = jnp.var(x32, axis=axes, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            y = y * scale + bias
        return y.astype(x.dtype)


class LayerInstanceNorm(nn.Module):
    """NICE-GAN ILN (``networks.py:618-691``): learnable soft selection
    between instance and layer statistics via a softmaxed rho."""

    rho_init: Sequence[float] = (1.0, 3.2)
    affine: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, gamma=None, beta=None):
        c = x.shape[-1]
        rho = self.param(
            "rho",
            lambda k, s: jnp.tile(jnp.asarray(self.rho_init, jnp.float32), (c, 1)),
            (c, 2),
        )
        x32 = x.astype(jnp.float32)
        sp_axes = tuple(range(1, x.ndim - 1))
        in_mean = jnp.mean(x32, axis=sp_axes, keepdims=True)
        in_var = jnp.var(x32, axis=sp_axes, keepdims=True)
        out_in = (x32 - in_mean) * jax.lax.rsqrt(in_var + self.eps)
        ln_axes = tuple(range(1, x.ndim))
        ln_mean = jnp.mean(x32, axis=ln_axes, keepdims=True)
        ln_var = jnp.var(x32, axis=ln_axes, keepdims=True)
        out_ln = (x32 - ln_mean) * jax.lax.rsqrt(ln_var + self.eps)
        w = jax.nn.softmax(rho, axis=-1)  # [c, 2]
        out = w[:, 0] * out_in + w[:, 1] * out_ln
        if gamma is not None:
            out = out * gamma[:, None, None, :] + beta[:, None, None, :]
        elif self.affine:
            g = self.param("gamma", nn.initializers.ones, (c,))
            b = self.param("beta", nn.initializers.zeros, (c,))
            out = out * g + b
        return out.astype(x.dtype)


def reflect_pad(x, pad: int):
    cfg = [(0, 0)] + [(pad, pad)] * (x.ndim - 2) + [(0, 0)]
    return jnp.pad(x, cfg, mode="reflect")


def replicate_pad(x, pad: int):
    cfg = [(0, 0)] + [(pad, pad)] * (x.ndim - 2) + [(0, 0)]
    return jnp.pad(x, cfg, mode="edge")


def _binomial_filter(size: int) -> np.ndarray:
    row = {
        1: [1.0],
        2: [1.0, 1.0],
        3: [1.0, 2.0, 1.0],
        4: [1.0, 3.0, 3.0, 1.0],
        5: [1.0, 4.0, 6.0, 4.0, 1.0],
        6: [1.0, 5.0, 10.0, 10.0, 5.0, 1.0],
        7: [1.0, 6.0, 15.0, 20.0, 15.0, 6.0, 1.0],
    }[size]
    a = np.asarray(row)
    f = a[:, None] * a[None, :]
    return f / f.sum()


class BlurDownsample(nn.Module):
    """Antialiased stride-2 downsampling with a fixed binomial filter
    (reference ``Downsample``, ``networks.py:266-289``): reflect pad 1,
    depthwise 3x3 [1,2,1]⊗[1,2,1]/16 conv at stride 2."""

    filt_size: int = 3
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        filt = _binomial_filter(self.filt_size).astype(np.float32)
        pad = (self.filt_size - 1) // 2
        pad_hi = int(np.ceil((self.filt_size - 1) / 2))
        cfg = [(0, 0), (pad, pad_hi), (pad, pad_hi), (0, 0)]
        xp = jnp.pad(x, cfg, mode="reflect")
        w = jnp.asarray(filt)[:, :, None, None]  # HWIO depthwise
        w = jnp.tile(w, (1, 1, 1, c)).astype(x.dtype)
        return jax.lax.conv_general_dilated(
            xp, w,
            window_strides=(self.stride, self.stride),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )


class BlurUpsample(nn.Module):
    """Antialiased 2x upsampling with a fixed binomial filter (reference
    ``Upsample``, ``networks.py:244-264``): replicate pad 1, transposed
    depthwise conv (filt4 * 4, stride 2, padding 2), crop [1:-1, 1:-1]."""

    filt_size: int = 4
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        filt = (_binomial_filter(self.filt_size) * self.stride**2).astype(
            np.float32
        )
        xp = replicate_pad(x, 1)
        w = jnp.asarray(filt)[:, :, None, None]
        w = jnp.tile(w, (1, 1, 1, c)).astype(x.dtype)
        # torch conv_transpose2d(stride=s, padding=p) == dilated conv with
        # lhs_dilation=s and padding k-1-p on each side (filter symmetric)
        k, p = self.filt_size, 1 + (self.filt_size - 1) // 2
        y = jax.lax.conv_general_dilated(
            xp, w,
            window_strides=(1, 1),
            padding=[(k - 1 - p, k - 1 - p)] * 2,
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        y = y[:, 1:, 1:, :]
        if self.filt_size % 2 == 0:
            y = y[:, :-1, :-1, :]
        return y


class SpectralNormConv(nn.Module):
    """2D conv with spectral normalization (power iteration), as used by the
    NICE-GAN discriminator (``networks.py:780-846``)."""

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    use_bias: bool = True
    kernel_init: Callable = kaiming

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, cin, self.features)
        )
        w2d = kernel.reshape(-1, self.features)
        u_var = self.variable(
            "spectral", "u",
            lambda: jax.random.normal(
                jax.random.PRNGKey(0), (self.features,), jnp.float32
            ),
        )
        u = u_var.value
        for _ in range(1):
            v = w2d @ u
            v = v / (jnp.linalg.norm(v) + 1e-12)
            u_new = w2d.T @ v
            u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
        sigma = v @ (w2d @ u_new)
        if update_stats and not self.is_initializing():
            u_var.value = jax.lax.stop_gradient(u_new)
        kernel = kernel / jax.lax.stop_gradient(sigma)
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype),
            window_strides=self.strides,
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


class SpectralNormDense(nn.Module):
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        cin = x.shape[-1]
        kernel = self.param("kernel", kaiming, (cin, self.features))
        u_var = self.variable(
            "spectral", "u",
            lambda: jax.random.normal(
                jax.random.PRNGKey(0), (self.features,), jnp.float32
            ),
        )
        u = u_var.value
        v = kernel @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u_new = kernel.T @ v
        u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
        sigma = v @ (kernel @ u_new)
        if update_stats and not self.is_initializing():
            u_var.value = jax.lax.stop_gradient(u_new)
        kernel = kernel / jax.lax.stop_gradient(sigma)
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


def l2_normalize(x, axis=-1, power=2.0, eps=1e-7):
    """Reference ``Normalize`` (``networks.py:509-518``)."""
    norm = jnp.sum(jnp.abs(x) ** power, axis=axis, keepdims=True) ** (1.0 / power)
    return x / (norm + eps)
