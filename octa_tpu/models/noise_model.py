"""Handcrafted OCTA contrast-adaptation noise model as pure JAX functions.

Reference: ``models/noise_model.py`` — control-point (9x9) Beta-distributed
fields, bicubically upsampled, applied as (1) background/vessel floor
``max(I, lambda_delta * I_d * Delta)``, (2) multiplicative speckle
``I * (lambda_s * N + 1 - lambda_s)``, (3) local gamma ``I ** Gamma``.

In the reference the parameters are torch ``nn.Parameter``s mutated by an
internal SGD optimizer for the adversarial (ANT) mode. Here the parameters
are an explicit pytree, sampling is a pure function of a PRNG key, and the
adversarial ascent is expressed with ``jax.grad`` in the ANT loss
(``octa_tpu/utils/losses.py``) — the idiomatic JAX formulation.

On TPU this runs *inside* the jitted train step, fused with the model's
forward pass — unlike the reference, which evaluates it per-sample in CPU
dataloader workers (``data/data_transforms.py:435-475``).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class NoiseParams(NamedTuple):
    alpha_vessel: jax.Array  # [B, gh, gw] Beta-dist alpha control points
    beta_vessel: jax.Array
    alpha_speckle: jax.Array
    beta_speckle: jax.Array
    gamma_cp: jax.Array      # [B, gh, gw] in [0, 1]


def sample_noise_params(rng: jax.Array, n_batch: int,
                        grid_size=(9, 9)) -> NoiseParams:
    """Re-randomize control points (reference ``reset_params``:
    alpha/beta = 10**(Beta(2,2)*2-1); gamma ~ U(0,1))."""
    ks = jax.random.split(rng, 5)
    shape = (n_batch, *grid_size)

    def beta22(k):
        return 10.0 ** (jax.random.beta(k, 2.0, 2.0, shape) * 2.0 - 1.0)

    return NoiseParams(
        alpha_vessel=beta22(ks[0]),
        beta_vessel=beta22(ks[1]),
        alpha_speckle=beta22(ks[2]),
        beta_speckle=beta22(ks[3]),
        gamma_cp=jax.random.uniform(ks[4], shape),
    )


def _bicubic_up(cp: jax.Array, hw: tuple[int, int]) -> jax.Array:
    """[B, gh, gw] -> [B, h, w] bicubic upsampling (align_corners=False)."""
    b = cp.shape[0]
    return jax.image.resize(cp, (b, *hw), method="cubic")


def _beta_field(rng, alpha_cp, beta_cp, hw):
    a = jnp.clip(_bicubic_up(alpha_cp, hw), 1e-3, None)
    b = jnp.clip(_bicubic_up(beta_cp, hw), 1e-3, None)
    # Beta(a,b) via two Gammas; jax.random.gamma is reparameterized
    # (implicit differentiation), matching torch's rsample for ANT gradients.
    k1, k2 = jax.random.split(rng)
    x = jax.random.gamma(k1, a)
    y = jax.random.gamma(k2, b)
    return x / (x + y + 1e-12)


def apply_noise_model(
    params: NoiseParams,
    rng: jax.Array,
    image: jax.Array,        # [B, H, W] synthetic vessel map in [0,1]
    background: jax.Array,   # [B, H, W] real background-noise crop
    lambda_delta: float = 1.0,
    lambda_speckle: float = 0.7,
    lambda_gamma: float = 0.3,
    downsample_factor: float = 1.0,
) -> jax.Array:
    """Apply the 3-stage noise model. Pure; differentiable w.r.t. ``params``."""
    b, h, w = image.shape
    size = (h, w)
    if downsample_factor != 1.0:
        hw = (int(h / downsample_factor), int(w / downsample_factor))
        img = jax.image.resize(image, (b, *hw), method="linear")
        bg = jax.image.resize(background, (b, *hw), method="linear")
    else:
        hw = size
        img, bg = image, background

    k1, k2 = jax.random.split(rng)
    delta = _beta_field(k1, params.alpha_vessel, params.beta_vessel, hw)
    speckle = _beta_field(k2, params.alpha_speckle, params.beta_speckle, hw)
    gamma = _bicubic_up(
        jnp.clip(params.gamma_cp, 0.0, 1.0) * (2 * lambda_gamma)
        + (1 - lambda_gamma),
        hw,
    )

    d = bg * lambda_delta * delta
    out = jnp.maximum(img, d)
    out = out * (lambda_speckle * speckle + (1 - lambda_speckle))
    out = jnp.power(out + 1e-6, gamma)

    if hw != size:
        out = jax.image.resize(out, (b, *size), method="linear")
    return out


def pga_update(params: NoiseParams, grads: NoiseParams,
               alpha: float, mode: str = "PGA") -> NoiseParams:
    """Projected-gradient-ascent step on the noise parameters (reference
    ``projected_gradient_ascent_step``, ``noise_model.py:3-11``)."""
    def upd(p, g):
        if mode == "GS":
            return jnp.clip(jnp.sign(g), 0.0, 1.0)
        if mode == "PGA":
            return jnp.clip(p + alpha * g, 0.0, 1.0)
        if mode == "FGSM":
            return jnp.clip(p + alpha * jnp.sign(g), 0.0, 1.0)
        raise NotImplementedError(mode)

    return jax.tree.map(upd, params, grads)
