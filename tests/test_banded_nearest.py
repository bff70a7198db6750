"""Banded nearest-scan (spatial pruning) unit tests.

The banded kernel + segment-boundary spatial restage are the TPU answer to
the reference's cKDTree range queries (reference
``vessel_graph_generation/element_mesh.py:87-218``): every consumer of the
growth loop's main scan is gated on a radius bound, so point blocks outside
a query tile's ±band y-interval can be skipped exactly.

Run on CPU via interpret mode (kernel semantics; the Mosaic lowering is
A/B-validated on hardware separately — interpret mode does not catch
Mosaic block-rule violations, see CLAUDE.md).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octa_tpu.ops.pallas_nearest import (masked_nearest_banded_pallas,
                                         masked_nearest_pallas)
from octa_tpu.sim import greenhouse as gh


def _brute(query, points, valid):
    d2 = ((query[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    d2 = np.where(valid[None, :], d2, np.inf)
    return np.sqrt(d2.min(1)), d2.argmin(1)


@pytest.mark.parametrize("sorted_pts", [True, False])
def test_banded_kernel_exact_within_band(sorted_pts):
    rng = np.random.default_rng(7)
    R, Q, N = 2, 300, 2048
    band = np.asarray([0.15, 0.08], np.float32)
    pts = rng.random((R, N, 3), dtype=np.float32)
    pts[..., 2] *= 0.01
    if sorted_pts:
        pts = np.take_along_axis(
            pts, np.argsort(pts[..., 1], axis=1)[..., None], axis=1)
    q = rng.random((R, Q, 3), dtype=np.float32)
    q[..., 2] *= 0.01
    valid = rng.random((R, N)) < 0.8
    alive = rng.random((R, Q)) < 0.7

    d_b, i_b = masked_nearest_banded_pallas(
        jnp.asarray(q), jnp.asarray(pts), jnp.asarray(valid)[:, None, :],
        jnp.asarray(alive), jnp.asarray(band), interpret=True)
    d_b, i_b = np.asarray(d_b)[:, 0], np.asarray(i_b)[:, 0]

    for r in range(R):
        d_t, i_t = _brute(q[r], pts[r], valid[r])
        for k in range(Q):
            if not alive[r, k]:
                continue  # dead queries may return anything
            if d_t[k] <= band[r]:
                # exactness contract: in-band results match the full scan
                assert d_b[r, k] == pytest.approx(d_t[k], abs=1e-6), \
                    (r, k, d_b[r, k], d_t[k])
                # the reported index is a valid point at the min distance
                assert valid[r, i_b[r, k]]
                d_at = np.sqrt(((q[r, k] - pts[r, i_b[r, k]]) ** 2).sum())
                assert d_at == pytest.approx(d_t[k], abs=1e-6)
            else:
                # out of band: must never report a spurious in-band hit
                assert d_b[r, k] > band[r]


def test_banded_kernel_matches_full_when_band_covers_everything():
    rng = np.random.default_rng(3)
    R, Q, N = 3, 257, 1024
    pts = rng.random((R, N, 3), dtype=np.float32)
    q = rng.random((R, Q, 3), dtype=np.float32)
    valid = rng.random((R, N)) < 0.9
    alive = np.ones((R, Q), bool)
    band = np.full((R,), 10.0, np.float32)  # covers the whole unit cube

    d_b, i_b = masked_nearest_banded_pallas(
        jnp.asarray(q), jnp.asarray(pts), jnp.asarray(valid)[:, None, :],
        jnp.asarray(alive), jnp.asarray(band), interpret=True)
    d_f, i_f = masked_nearest_pallas(
        jnp.asarray(q), jnp.asarray(pts), jnp.asarray(valid)[:, None, :],
        interpret=True)
    np.testing.assert_allclose(np.asarray(d_b), np.asarray(d_f), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i_b), np.asarray(i_f))


@pytest.fixture(scope="module")
def tiny_state():
    return _tiny_grown_state()


def _tiny_grown_state():
    cfg = {
        "SimulationSpace": {"no_voxel_x": 1, "no_voxel_y": 1,
                            "no_voxel_z": 0.0131},
        "d": 0.1, "r": 0.0025, "FAZ_radius_bound": [0.44, 0.04],
        "rotation_radius": 1.05, "FAZ_center": [0.5, 0.5],
        "param_scale": 3,
        "modes": [{"name": "SVC", "I": 10, "N": 400, "eps_n": 0.18,
                   "eps_s": 0.135, "eps_k": 0.135, "delta_art": 0.2925,
                   "delta_ven": 0.2925, "gamma_art": 50, "gamma_ven": 50,
                   "phi": 15, "omega": 0.3, "kappa": 2.55,
                   "delta_sigma": 0.02}],
    }
    forest = {"type": "stumps", "N_trees": 4,
              "source_walls": {"x0": True, "x1": True, "y0": True,
                               "y1": True, "z0": False, "z1": False}}
    g = gh.Greenhouse(cfg, node_capacity=2048, sink_capacity=1024, seed=11)
    return g.develop_forest(forest, batch=1, final_murray_sweeps=32)


def _edge_set(f, b=0):
    """Set of (parent_pos, child_pos, radius) tuples — permutation-proof."""
    pos = np.asarray(f.pos[b])
    par = np.asarray(f.parent[b])
    rad = np.asarray(f.radius[b])
    n = int(f.n_nodes[b])
    out = set()
    for i in range(n):
        if par[i] >= 0:
            out.add(tuple(np.round(pos[par[i]], 6)) +
                    tuple(np.round(pos[i], 6)) + (round(float(rad[i]), 6),))
    return out


def test_ysort_forest_is_pure_relabeling(tiny_state):
    f = tiny_state.art
    fs = jax.vmap(gh._ysort_forest)(f)
    assert int(fs.n_nodes[0]) == int(f.n_nodes[0])
    # y-sorted prefix
    n = int(f.n_nodes[0])
    y = np.asarray(fs.pos[0, :n, 1])
    assert (np.diff(y) >= 0).all()
    # identical edge multiset (positions + radii), pointers consistent
    assert _edge_set(fs) == _edge_set(f)
    # child pointers remapped consistently: every first_child's parent
    # points back at the node
    fc = np.asarray(fs.first_child[0])
    par = np.asarray(fs.parent[0])
    for i in range(n):
        if fc[i] >= 0:
            assert par[fc[i]] == i
    # Murray fixed point is permutation-invariant: radii still converged
    f2 = jax.vmap(lambda ff: gh.murray_sweep(ff, 32, exact=True))(fs)
    np.testing.assert_allclose(np.asarray(f2.radius[0, :n]),
                               np.asarray(fs.radius[0, :n]),
                               rtol=0, atol=1e-6)


def test_ysort_sinks_compacts_alive_prefix(tiny_state):
    s = tiny_state.oxy
    ss = jax.vmap(gh._ysort_sinks)(s)
    a_old = np.asarray(s.alive[0])
    a_new = np.asarray(ss.alive[0])
    assert a_new.sum() == a_old.sum()
    n = int(a_new.sum())
    assert a_new[:n].all() and not a_new[n:].any()
    y = np.asarray(ss.pos[0, :n, 1])
    assert (np.diff(y) >= 0).all()
    old_set = {tuple(np.round(p, 6))
               for p in np.asarray(s.pos[0])[a_old]}
    new_set = {tuple(np.round(p, 6))
               for p in np.asarray(ss.pos[0])[:n]}
    assert old_set == new_set


def test_banded_growth_statistical_parity(tiny_state, monkeypatch):
    """Growth with OCTA_TPU_BANDED=1 on CPU exercises the restage +
    tail-append + candidate-y-sort machinery with full scans (the banded
    kernel itself is TPU-only and covered above + by the hardware A/B).
    The changes are reorderings (exchangeable candidates, sink slot
    assignment), so results must agree at statistical-parity scale."""
    monkeypatch.setenv("OCTA_TPU_BANDED", "1")
    state_b = _tiny_grown_state()
    n_ref = np.asarray(tiny_state.art.n_nodes) + np.asarray(
        tiny_state.ven.n_nodes)
    n_b = np.asarray(state_b.art.n_nodes) + np.asarray(state_b.ven.n_nodes)
    # tiny schedule => wide tolerance; the docker-schedule TPU A/B gates
    # the production scale at ~0.1-1%
    assert abs(int(n_b[0]) - int(n_ref[0])) / int(n_ref[0]) < 0.3, \
        (n_b, n_ref)
    # the growth is real and the restaged/banded pointers stayed sane
    f = state_b.art
    n = int(f.n_nodes[0])
    assert n > 8
    par = np.asarray(f.parent[0, :n])
    assert ((par >= -1) & (par < n)).all()


def test_append_sinks_tail_fill_places_same_set(monkeypatch):
    rng = np.random.default_rng(5)
    sc, sq = 256, 64
    pos = jnp.asarray(rng.random((sc, 3), dtype=np.float32))
    alive = jnp.asarray(rng.random(sc) < 0.5)
    cand = jnp.asarray(rng.random((sq, 3), dtype=np.float32))
    accept = jnp.asarray(rng.random(sq) < 0.3)
    s0 = gh.SinkState(pos, alive)

    monkeypatch.delenv("OCTA_TPU_BANDED", raising=False)
    head, sw_h, scap_h = gh._append_sinks(s0, cand, accept, max_append=64)
    monkeypatch.setenv("OCTA_TPU_BANDED", "1")
    tail, sw_t, scap_t = gh._append_sinks(s0, cand, accept, max_append=64)

    assert bool(sw_h) == bool(sw_t) and bool(scap_h) == bool(scap_t)

    def live_set(s):
        return {tuple(np.round(p, 6))
                for p in np.asarray(s.pos)[np.asarray(s.alive)]}

    assert live_set(head) == live_set(tail)
    # tail fill really used the highest free slots
    placed_t = np.flatnonzero(np.asarray(tail.alive) & ~np.asarray(alive))
    free = np.flatnonzero(~np.asarray(alive))
    k = len(placed_t)
    np.testing.assert_array_equal(placed_t, np.sort(free[-k:]))
