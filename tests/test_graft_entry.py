"""Validate the driver entry points on the virtual 8-device CPU mesh."""
import jax
import pytest


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)


def test_entry_compiles_tiny():
    import jax.numpy as jnp

    import __graft_entry__ as ge

    fn, (params, x) = ge.entry()
    # compile-check at a small spatial size on CPU (1216² is for real TPU)
    small = jnp.zeros((1, 64, 64, 1))
    out = jax.jit(fn)(params, small)
    assert out.shape == (1, 64, 64, 1)
