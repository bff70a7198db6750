"""Classical vesselness filters on TPU.

- :func:`frangi`  — multiscale Hessian vesselness (reference
  ``models/frangi.py:7-21``: skimage.filters.frangi, sigmas arange(0.5,2,0.5),
  alpha=1, beta=15, black_ridges=False), as separable Gaussian-derivative
  convolutions + closed-form 2x2 eigenvalues.
- :func:`oof`     — 2D Optimal Oriented Flux via FFT Bessel filters
  (reference ``models/oof.py:55-131``), ported to jnp.fft.
- :func:`skrgan_sketch` — Sobel magnitude -> Gaussian -> area open/close
  (reference ``models/skrgan.py:15-34``); the max-tree area filters run on
  host via a threshold-decomposition over scipy.ndimage.label.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _gauss_kernel1d(sigma: float, order: int, radius: int) -> np.ndarray:
    """Gaussian (derivative) kernel identical to scipy.ndimage.gaussian_filter1d."""
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 / (sigma * sigma) * x**2)
    phi = phi / phi.sum()
    if order == 0:
        return phi
    # polynomial derivative coefficients (scipy _gaussian_kernel1d)
    exponent_range = np.arange(order + 1)
    q = np.zeros(order + 1)
    q[0] = 1
    D = np.diag(exponent_range[1:], 1)  # D @ q(x) = q'(x)
    P = np.diag(np.ones(order) / -(sigma * sigma), -1)  # P @ q = q(x)*x/sigma^2
    Q_deriv = D + P
    for _ in range(order):
        q = Q_deriv.dot(q)
    q = (x[:, None] ** exponent_range).dot(q)
    return q * phi


def _sep_conv2d(img, kr, kc):
    """Separable 2D convolution with reflect ('mirror') boundary (NHW)."""
    pr, pc = len(kr) // 2, len(kc) // 2
    x = jnp.pad(img, [(0, 0), (pr, pr), (0, 0)], mode="reflect")
    x = _conv_axis(x, jnp.asarray(kr, img.dtype)[::-1], 1)
    x = jnp.pad(x, [(0, 0), (0, 0), (pc, pc)], mode="reflect")
    return _conv_axis(x, jnp.asarray(kc, img.dtype)[::-1], 2)


def _conv_axis(x, k, axis):
    """Valid-mode 1D convolution along `axis` of an NHW tensor."""
    w = k.reshape((-1, 1) if axis == 1 else (1, -1))[:, :, None, None]
    return jax.lax.conv_general_dilated(
        x[..., None], w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[..., 0]


def _hessian(img, sigma: float):
    """Gaussian-derivative Hessian (matches skimage's use of
    scipy gaussian_filter orders, truncate=4, with the sigma**2 scaling)."""
    radius = int(4 * sigma + 0.5)
    g0 = _gauss_kernel1d(sigma, 0, radius)
    g1 = _gauss_kernel1d(sigma, 1, radius)
    g2 = _gauss_kernel1d(sigma, 2, radius)
    s2 = sigma * sigma
    hrr = _sep_conv2d(img, g2, g0) * s2
    hcc = _sep_conv2d(img, g0, g2) * s2
    hrc = _sep_conv2d(img, g1, g1) * s2
    return hrr, hrc, hcc


@functools.partial(jax.jit, static_argnames=("sigmas", "alpha", "beta", "black_ridges"))
def frangi(
    img: jax.Array,
    sigmas: tuple[float, ...] = (0.5, 1.0, 1.5),
    alpha: float = 1.0,
    beta: float = 15.0,
    black_ridges: bool = False,
) -> jax.Array:
    """Frangi vesselness of a batch of 2D images [B, H, W] (values ~[0,255])."""
    x = img.astype(jnp.float32)
    if black_ridges:
        x = -x
    result = jnp.zeros_like(x)
    for sigma in sigmas:
        hrr, hrc, hcc = _hessian(x, float(sigma))
        # eigenvalues of [[hrr, hrc],[hrc, hcc]], sorted by |.|: |l1| <= |l2|
        tr = hrr + hcc
        disc = jnp.sqrt(jnp.maximum((hrr - hcc) ** 2 + 4 * hrc**2, 0.0))
        e1 = (tr + disc) / 2
        e2 = (tr - disc) / 2
        swap = jnp.abs(e1) > jnp.abs(e2)
        l1 = jnp.where(swap, e2, e1)
        l2 = jnp.where(swap, e1, e2)
        # skimage: lambdas clipped; vesselness formula
        l2m = jnp.where(l2 == 0, 1e-10, l2)
        rb2 = (l1 / l2m) ** 2
        s2_ = l1**2 + l2**2
        gamma = jnp.maximum(jnp.max(jnp.sqrt(s2_), axis=(1, 2), keepdims=True) / 2, 1e-10) ** 2
        v = jnp.exp(-rb2 / (2 * alpha**2)) * (1 - jnp.exp(-s2_ / (2 * gamma)))
        v = jnp.where(l2 > 0, 0.0, v)  # bright ridges: l2 < 0
        result = jnp.maximum(result, v)
    return result


def _ifft_shifted_coords(shape):
    out = []
    for i, s in enumerate(shape):
        p = s // 2
        a = np.concatenate([np.arange(p, s), np.arange(p)]) - p
        re = [1, 1]
        re[i] = s
        out.append(np.tile(a.reshape(re), [s if j != i else 1 for j in range(2)]).astype(float))
    return out


@functools.partial(jax.jit, static_argnames=("num_radii", "sigma", "response_type"))
def oof(img: jax.Array, num_radii: int = 5, sigma: float = 1.0,
        response_type: int = 1) -> jax.Array:
    """2D Optimal Oriented Flux of a single image [H, W] (values ~[0,255])."""
    EPS = 1e-12
    shape = img.shape
    x_np, y_np = _ifft_shifted_coords(shape)
    x = jnp.asarray(x_np / shape[0])
    y = jnp.asarray(y_np / shape[1])
    sphere_radius = jnp.sqrt(x**2 + y**2) + EPS
    imgfft = jnp.fft.fftn(img.astype(jnp.float32))
    output = jnp.zeros(shape, jnp.float32)
    from scipy.special import jv as besselj  # host constant

    for radius in np.arange(1, num_radii + 1, dtype=float):
        circle = 2 * math.pi * radius
        bessel = besselj(1.5, circle * EPS) / EPS ** (3 / 2)
        base = radius / math.sqrt(2 * radius * sigma - sigma**2)
        volume = math.pi * radius**2
        normalization = volume / bessel / radius**2 * base  # normalization_type=1
        num = normalization * jnp.exp(
            (-(sigma**2)) * 2 * math.pi**2 * sphere_radius**2
        )
        besselj_buffer = num / sphere_radius ** (3 / 2)
        cs = circle * sphere_radius
        a = jnp.sin(cs) / cs - jnp.cos(cs)
        b = jnp.sqrt(1.0 / (math.pi**2 * radius * sphere_radius))
        besselj_buffer = besselj_buffer * a * b * imgfft
        f11 = jnp.real(jnp.fft.ifftn(x * x * besselj_buffer))
        f12 = jnp.real(jnp.fft.ifftn(x * y * besselj_buffer))
        f22 = jnp.real(jnp.fft.ifftn(y * y * besselj_buffer))
        tr = f11 + f22
        disc = jnp.sqrt(jnp.maximum((f11 - f22) ** 2 + 4 * f12**2, 0.0))
        l1 = (tr + disc) / 2
        l2 = (tr - disc) / 2
        maxe = jnp.where(jnp.abs(l2) > jnp.abs(l1), l2, l1)
        mine = jnp.where(jnp.abs(l2) < jnp.abs(l1), l2, l1)
        mide = l1 + l2 - maxe - mine
        if response_type == 0:
            feat = maxe
        elif response_type == 1:
            feat = maxe + mide
        elif response_type == 2:
            feat = jnp.sqrt(jnp.maximum(0, maxe * mide))
        elif response_type == 4:
            feat = jnp.maximum(0, maxe)
        elif response_type == 5:
            feat = jnp.maximum(0, maxe + mide)
        else:
            raise NotImplementedError(response_type)
        output = jnp.where(jnp.abs(feat) > jnp.abs(output), feat, output)
    return output


def _area_filter_host(img: np.ndarray, area_threshold: int, closing: bool,
                      levels: int = 256) -> np.ndarray:
    """Grayscale area opening/closing via threshold decomposition
    (host-side; quantized approximation of skimage's max-tree filter)."""
    from scipy import ndimage as ndi

    x = -img if closing else img
    lo, hi = float(x.min()), float(x.max())
    if hi <= lo:
        return img.copy()
    qs = np.linspace(lo, hi, levels + 1)[1:]
    out = np.full(x.shape, lo, dtype=np.float64)
    for q in qs:
        mask = x >= q
        lab, n = ndi.label(mask)
        if n == 0:
            continue
        sizes = np.bincount(lab.ravel())
        keep = sizes >= area_threshold
        keep[0] = False
        out = np.where(keep[lab], q, out)
    return -out if closing else out


def skrgan_sketch(img: np.ndarray, sigma: float = 2.0,
                  area_threshold_open: int = 64,
                  area_threshold_close: int = 64) -> np.ndarray:
    """SkrGAN sketch transform (host; reference ``models/skrgan.py:15-34``)."""
    from scipy.ndimage import gaussian_filter, sobel

    x = np.asarray(img, np.float32).squeeze()
    sh = sobel(x, 0)
    sv = sobel(x, 1)
    mag = np.sqrt(sh**2 + sv**2)
    mag -= mag.min()
    mag /= max(mag.max(), 1e-12)
    filt = gaussian_filter(mag, sigma=sigma)
    opened = _area_filter_host(filt, area_threshold_open, closing=False)
    opened -= opened.min()
    opened /= max(opened.max(), 1e-12)
    closed = _area_filter_host(opened, area_threshold_close, closing=True)
    closed -= closed.min()
    closed /= max(closed.max(), 1e-12)
    return closed
