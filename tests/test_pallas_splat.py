"""Pallas line-splat kernel vs the XLA scan reference implementation.

Runs in Pallas interpret mode on the CPU test mesh; the compiled TPU path is
exercised by bench.py / the driver. Parity target: bit-level agreement with
:func:`octa_tpu.ops.raster.splat_lines_2d` (same coverage law, same
compositing), which itself is golden-tested against the reference renderer.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from octa_tpu.ops import raster
from octa_tpu.ops.pallas_splat import splat_lines_2d_pallas


def _random_edges(rng, e=300, res=304, wmax=8.0):
    a = rng.random((e, 2)).astype(np.float32) * res
    b = (a + rng.normal(0, 20, (e, 2))).astype(np.float32)
    w = (rng.random(e) * wmax + 0.5).astype(np.float32)
    v = np.ones(e, bool)
    v[e - e // 4:] = False
    return jnp.array(a), jnp.array(b), jnp.array(w), jnp.array(v)


def test_matches_xla_splat(rng):
    a, b, w, v = _random_edges(rng)
    ref = raster.splat_lines_2d(a, b, w, v, height=304, width=304, k_max=512)
    out = splat_lines_2d_pallas(
        a, b, w, v, height=304, width=304, k_max=512, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_off_image_edges(rng):
    a, b, w, v = _random_edges(rng)
    a = a.at[:50].add(-250.0)
    b = b.at[:50].add(-250.0)
    ref = raster.splat_lines_2d(a, b, w, v, height=304, width=304, k_max=512)
    out = splat_lines_2d_pallas(
        a, b, w, v, height=304, width=304, k_max=512, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_batched_matches_single(rng):
    a, b, w, v = _random_edges(rng, e=150)
    ab = jnp.stack([a, a + 3.0])
    bb = jnp.stack([b, b + 3.0])
    wb, vb = jnp.stack([w, w]), jnp.stack([v, v])
    outb = splat_lines_2d_pallas(
        ab, bb, wb, vb, height=304, width=304, k_max=256, interpret=True)
    out0 = splat_lines_2d_pallas(
        a, b, w, v, height=304, width=304, k_max=256, interpret=True)
    assert outb.shape == (2, 304, 304)
    np.testing.assert_allclose(np.asarray(outb[0]), np.asarray(out0), atol=1e-5)


def test_wide_edges_need_span_3(rng):
    # dilated bboxes wider than one 128px tile: span_=3 must recover parity
    a = jnp.array([[64.0, 10.0], [150.0, 40.0]], jnp.float32)
    b = jnp.array([[64.0, 240.0], [250.0, 220.0]], jnp.float32)
    w = jnp.array([30.0, 48.0], jnp.float32)
    v = jnp.array([True, True])
    ref = raster.splat_lines_2d(a, b, w, v, height=304, width=304, k_max=64)
    out = splat_lines_2d_pallas(
        a, b, w, v, height=304, width=304, k_max=64, span_=3, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_auto_dispatch_cpu_fallback(rng):
    # on the CPU test backend the auto wrapper must route to the XLA path
    a, b, w, v = _random_edges(rng, e=64)
    out = raster.splat_lines_2d_auto(
        a, b, w, v, height=304, width=304, k_max=128)
    ref = raster.splat_lines_2d(a, b, w, v, height=304, width=304, k_max=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_empty_and_zero_valid(rng):
    a = jnp.zeros((8, 2), jnp.float32)
    b = jnp.ones((8, 2), jnp.float32)
    w = jnp.ones((8,), jnp.float32)
    v = jnp.zeros((8,), bool)
    out = splat_lines_2d_pallas(
        a, b, w, v, height=128, width=128, k_max=8, interpret=True)
    assert float(jnp.max(out)) == 0.0
