"""Handcrafted noise model (reference models/noise_model.py): formula parity
in the deterministic limit, parameter statistics, PGA update semantics."""
import numpy as np
import jax
import jax.numpy as jnp

from octa_tpu.models import noise_model as nm


def _concentrated(t, shape):
    """Control points making Beta(a,b) concentrate at mean t."""
    return (np.full(shape, 5e4 * t, np.float32),
            np.full(shape, 5e4 * (1 - t), np.float32))


def test_formula_matches_reference_arithmetic(rng):
    """With Beta fields concentrated at known means the model must equal the
    reference's closed-form arithmetic (noise_model.py:84-91):
    pow(max(I, I_d*ld*Delta) * (ls*N + 1-ls) + 1e-6, Gamma)."""
    b, h, w = 2, 32, 32
    t_delta, t_speckle, g_cp = 0.7, 0.4, 0.25
    av, bv = _concentrated(t_delta, (b, 9, 9))
    asp, bsp = _concentrated(t_speckle, (b, 9, 9))
    params = nm.NoiseParams(
        alpha_vessel=jnp.asarray(av), beta_vessel=jnp.asarray(bv),
        alpha_speckle=jnp.asarray(asp), beta_speckle=jnp.asarray(bsp),
        gamma_cp=jnp.full((b, 9, 9), g_cp))
    img = rng.random((b, h, w)).astype(np.float32)
    bg = rng.random((b, h, w)).astype(np.float32)
    ld, ls, lg = 1.0, 0.7, 0.3
    out = np.asarray(nm.apply_noise_model(
        params, jax.random.PRNGKey(0), jnp.asarray(img), jnp.asarray(bg),
        lambda_delta=ld, lambda_speckle=ls, lambda_gamma=lg))
    gamma = g_cp * 2 * lg + (1 - lg)
    expect = np.power(
        np.maximum(img, bg * ld * t_delta) * (ls * t_speckle + 1 - ls) + 1e-6,
        gamma)
    np.testing.assert_allclose(out, expect, atol=0.02)


def test_sampled_param_ranges():
    p = nm.sample_noise_params(jax.random.PRNGKey(3), 8)
    for cp in (p.alpha_vessel, p.beta_vessel, p.alpha_speckle,
               p.beta_speckle):
        a = np.asarray(cp)
        assert a.min() >= 0.1 - 1e-5 and a.max() <= 10.0 + 1e-4  # 10**[-1,1]
    g = np.asarray(p.gamma_cp)
    assert g.min() >= 0.0 and g.max() <= 1.0


def test_output_range_and_grads(rng):
    b = 2
    params = nm.sample_noise_params(jax.random.PRNGKey(0), b)
    img = jnp.asarray(rng.random((b, 64, 64)).astype(np.float32))
    bg = jnp.asarray(rng.random((b, 64, 64)).astype(np.float32))

    def loss(p):
        return jnp.mean(nm.apply_noise_model(p, jax.random.PRNGKey(1),
                                             img, bg))

    out = nm.apply_noise_model(params, jax.random.PRNGKey(1), img, bg)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.01
    g = jax.grad(loss)(params)
    gmax = max(float(jnp.abs(v).max()) for v in jax.tree.leaves(g))
    assert np.isfinite(gmax) and gmax > 0  # reparameterized Beta: grads flow


def test_pga_update_modes():
    p = nm.NoiseParams(*[jnp.full((1, 2, 2), 0.5)] * 5)
    g = nm.NoiseParams(*[jnp.full((1, 2, 2), -2.0)] * 5)
    stepped = nm.pga_update(p, g, alpha=0.1, mode="PGA")
    np.testing.assert_allclose(np.asarray(stepped.gamma_cp), 0.3, atol=1e-6)
    fgsm = nm.pga_update(p, g, alpha=0.1, mode="FGSM")
    np.testing.assert_allclose(np.asarray(fgsm.gamma_cp), 0.4, atol=1e-6)
    gs = nm.pga_update(p, g, alpha=0.1, mode="GS")
    np.testing.assert_allclose(np.asarray(gs.gamma_cp), 0.0, atol=1e-6)
