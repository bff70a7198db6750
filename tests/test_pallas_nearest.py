"""Parity of the Pallas masked-nearest kernel (interpret mode) vs the XLA
chunked scan and a numpy oracle."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from octa_tpu.ops.pallas_nearest import masked_nearest_pallas
from octa_tpu.sim.greenhouse import _chunked_nearest2


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    R, Q, N = 3, 300, 520
    q = rng.random((R, Q, 3)).astype(np.float32)
    p = rng.random((R, N, 3)).astype(np.float32)
    ma = rng.random((R, N)) < 0.6
    mb = rng.random((R, N)) < 0.9
    return q, p, ma, mb


def _oracle(q, p, mask):
    d = np.linalg.norm(q[:, None, :] - p[None, :, :], axis=-1)
    d = np.where(mask[None, :], d, np.inf)
    return d.min(1), d.argmin(1)


def test_pallas_nearest_matches_oracle(data):
    q, p, ma, mb = data
    masks = jnp.stack([jnp.asarray(ma), jnp.asarray(mb)], axis=1)
    d, i = masked_nearest_pallas(jnp.asarray(q), jnp.asarray(p), masks,
                                 tq=128, blk=256, interpret=True)
    for r in range(q.shape[0]):
        for m, mask in ((0, ma[r]), (1, mb[r])):
            od, oi = _oracle(q[r], p[r], mask)
            np.testing.assert_allclose(np.asarray(d[r, m]), od, atol=2e-3)
            assert (np.asarray(i[r, m]) == oi).mean() > 0.99


def test_pallas_nearest_matches_xla_scan(data):
    q, p, ma, mb = data
    masks = jnp.stack([jnp.asarray(ma), jnp.asarray(mb)], axis=1)
    d, i = masked_nearest_pallas(jnp.asarray(q), jnp.asarray(p), masks,
                                 tq=128, blk=256, interpret=True)
    da, ia, db, ib = jax.vmap(
        lambda qq, pp, a, b: _chunked_nearest2(qq, pp, a, b, chunk=128))(
            jnp.asarray(q), jnp.asarray(p), jnp.asarray(ma), jnp.asarray(mb))
    np.testing.assert_allclose(np.asarray(d[:, 0]), np.asarray(da), atol=2e-3)
    np.testing.assert_allclose(np.asarray(d[:, 1]), np.asarray(db), atol=2e-3)
    assert (np.asarray(i[:, 0]) == np.asarray(ia)).mean() > 0.99
    assert (np.asarray(i[:, 1]) == np.asarray(ib)).mean() > 0.99


def test_pallas_nearest_min_only_and_all_invalid():
    rng = np.random.default_rng(1)
    q = rng.random((1, 64, 3)).astype(np.float32)
    p = rng.random((1, 100, 3)).astype(np.float32)
    mask = np.zeros((1, 1, 100), bool)  # nothing valid
    d = masked_nearest_pallas(jnp.asarray(q), jnp.asarray(p),
                              jnp.asarray(mask), want_idx=False,
                              tq=64, blk=128, interpret=True)
    assert np.all(np.asarray(d) > 1e6)



def test_nearest_no_catastrophic_cancellation():
    """Difference-form d² is exact where the expanded |q|²+|p|²-2q·p form
    loses ~7 digits: offset the unit-cube geometry far from the origin and
    require f64-accurate distances (retired PARITY §2.1 caveat)."""
    import numpy as np
    import jax.numpy as jnp

    from octa_tpu.ops.pallas_nearest import masked_nearest_pallas
    from octa_tpu.sim.greenhouse import _chunked_nearest

    rng = np.random.default_rng(7)
    base = rng.random((256, 3)).astype(np.float32) + 100.0  # big norms
    q = base[:128] + rng.normal(0, 2e-4, (128, 3)).astype(np.float32)
    pts = base
    mask = np.ones((256,), bool)

    exact = np.sqrt(((q.astype(np.float64)[:, None]
                      - pts.astype(np.float64)[None]) ** 2).sum(-1)).min(1)

    d_xla, _ = _chunked_nearest(jnp.asarray(q), jnp.asarray(pts),
                                jnp.asarray(mask), chunk=256)
    d_pl, _ = masked_nearest_pallas(q[None], pts[None], mask[None, None],
                                    interpret=True)
    for d in (np.asarray(d_xla), np.asarray(d_pl[0, 0])):
        rel = np.abs(d - exact) / np.maximum(exact, 1e-12)
        assert rel.max() < 1e-3, rel.max()
        # the expanded form fails this by orders of magnitude here: its
        # absolute d² error is ~|q|²·eps ≈ 3e4·6e-8 ≈ 2e-3 vs d² ≈ 1e-7
