"""One-hot-matmul segment sum vs the scatter-add oracle.

Interpret mode does not catch Mosaic block-rule violations (CLAUDE.md), so
these tests pin semantics (values, sentinel handling, padding, vmap
batching); the TPU-side validation is the growth benchmark plus the sim
parity suite, which route through this kernel on device.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octa_tpu.ops.pallas_segsum import segsum_onehot_pallas


def _oracle(seg, feats, nc):
    return np.asarray(
        jnp.zeros((nc + 1, feats.shape[-1]), jnp.float32)
        .at[seg].add(feats)[:nc])


@pytest.mark.parametrize("sq,nc", [
    (2048, 2048),      # exactly tiled
    (3072, 6144),      # sink_cap + 2048 candidates, sb-padded
    (1024, 1024),      # small early-stage capacities
    (3000, 1000),      # nothing divisible: both sides padded
])
def test_matches_scatter(sq, nc):
    rng = np.random.default_rng(0)
    # include the dropped-row sentinel nc with ~25% mass
    seg = jnp.asarray(rng.integers(0, nc + 1, sq), jnp.int32)
    seg = jnp.where(jnp.asarray(rng.random(sq) < 0.25), nc, seg)
    feats = jnp.asarray(rng.normal(size=(sq, 18)), jnp.float32)
    got = segsum_onehot_pallas(seg, feats, nc=nc, interpret=True)
    np.testing.assert_allclose(np.asarray(got), _oracle(seg, feats, nc),
                               rtol=1e-4, atol=1e-4)


def test_nested_vmap_batches_like_growth_loop():
    """The growth loop applies the kernel under vmap(batch) o vmap(art/ven)."""
    rng = np.random.default_rng(1)
    b, r, sq, nc = 3, 2, 1024, 512
    seg = jnp.asarray(rng.integers(0, nc + 1, (b, r, sq)), jnp.int32)
    feats = jnp.asarray(rng.normal(size=(b, r, sq, 18)), jnp.float32)
    fn = jax.vmap(jax.vmap(
        lambda s, f: segsum_onehot_pallas(s, f, nc=nc, interpret=True)))
    got = np.asarray(fn(seg, feats))
    for i in range(b):
        for j in range(r):
            np.testing.assert_allclose(
                got[i, j], _oracle(seg[i, j], feats[i, j], nc),
                rtol=1e-4, atol=1e-4)


def test_sentinel_only_contributions_are_dropped():
    seg = jnp.full((2048,), 100, jnp.int32)   # all dropped (nc == 100)
    feats = jnp.ones((2048, 18), jnp.float32)
    got = segsum_onehot_pallas(seg, feats, nc=100, interpret=True)
    assert float(jnp.max(jnp.abs(got))) == 0.0


def test_single_feature_murray_shape():
    """murray_sweep routes child radius sums through the kernel with F=1."""
    rng = np.random.default_rng(2)
    sq = nc = 2048   # Murray: one entry per node, targets = parents
    seg = jnp.asarray(rng.integers(0, nc + 1, sq), jnp.int32)
    feats = jnp.asarray(rng.random((sq, 1)), jnp.float32)
    got = segsum_onehot_pallas(seg, feats, nc=nc, interpret=True)
    np.testing.assert_allclose(np.asarray(got), _oracle(seg, feats, nc),
                               rtol=1e-4, atol=1e-4)
