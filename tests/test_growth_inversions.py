"""The growth loop's scatter-free append machinery, pinned against
sequential oracles: node emission places via a cumsum-searchsorted window
inversion and sink placement via compacted free-slot inversion — both must
reproduce the order-preserving sequential semantics of the reference
(each accepted item fills the next free slot / window position in index
order)."""
import numpy as np

import jax.numpy as jnp

from octa_tpu.sim import greenhouse as gh


def test_emission_window_inversion_matches_sequential_append():
    rng = np.random.default_rng(0)
    for _ in range(50):
        nc, new_cap = 64, 16
        n_nodes = int(rng.integers(0, 50))
        n_emit_raw = rng.choice([0, 1, 2], nc, p=[0.7, 0.2, 0.1])

        # the _grow_core capping rules
        cum_raw = np.cumsum(n_emit_raw)
        fits = ((n_nodes + cum_raw) <= nc) & (cum_raw <= new_cap)
        n_emit = np.where(fits, n_emit_raw, 0)
        cum = np.cumsum(n_emit)
        total = int(cum[-1])

        # oracle: sequential append in node order
        oracle = {}  # window slot j -> (source node, child rank)
        slot = 0
        for i in range(nc):
            for r in range(n_emit[i]):
                oracle[slot] = (i, r)
                slot += 1

        # the inversion as implemented (searchsorted 'right' over cum)
        j = np.arange(new_cap)
        src = np.clip(np.searchsorted(cum, j, side="right"), 0, nc - 1)
        rank = j - (cum[src] - n_emit[src])
        for jj in range(total):
            assert (src[jj], rank[jj]) == oracle[jj], (jj, n_emit)
        # offs (per-node first window slot) must invert src
        offs = n_nodes + cum - n_emit
        for jj in range(total):
            assert offs[src[jj]] - n_nodes + rank[jj] == jj


def test_append_sinks_matches_sequential_fill():
    rng = np.random.default_rng(1)
    for _ in range(20):
        sc, sq = 48, 40
        alive = rng.random(sc) < 0.5
        accept = rng.random(sq) < 0.3
        pos = rng.random((sq, 3)).astype(np.float32)

        state, sat_win, sat_cap = gh._append_sinks(
            gh.SinkState(jnp.zeros((sc, 3), jnp.float32), jnp.asarray(alive)),
            jnp.asarray(pos), jnp.asarray(accept), max_append=sq)
        assert not bool(sat_win)
        assert bool(sat_cap) == (int(accept.sum()) > int((~alive).sum()))

        # oracle: accepted candidates fill free slots in index order
        exp_pos = np.zeros((sc, 3), np.float32)
        exp_alive = alive.copy()
        free = [i for i in range(sc) if not alive[i]]
        acc = [i for i in range(sq) if accept[i]]
        for slot, cand in zip(free, acc):
            exp_pos[slot] = pos[cand]
            exp_alive[slot] = True
        np.testing.assert_array_equal(np.asarray(state.alive), exp_alive)
        np.testing.assert_allclose(np.asarray(state.pos), exp_pos)


def test_append_sinks_overflow_sets_sat():
    sc, sq = 16, 32
    state, sat_win, sat_cap = gh._append_sinks(
        gh.SinkState(jnp.zeros((sc, 3), jnp.float32),
                     jnp.zeros((sc,), bool)),
        jnp.ones((sq, 3), jnp.float32), jnp.ones((sq,), bool), max_append=8)
    assert bool(sat_win)
    assert not bool(sat_cap)  # the 8-row window fits the 16 free slots
    assert int(jnp.sum(state.alive)) == 8  # the window that did fit


def test_append_sinks_capacity_saturation_sets_sat_cap():
    # more accepted candidates than free slots (window is big enough):
    # sat_capacity must fire so the driver re-runs with a larger sink array
    sc, sq = 8, 32
    alive = jnp.asarray([True] * 6 + [False] * 2)
    state, sat_win, sat_cap = gh._append_sinks(
        gh.SinkState(jnp.zeros((sc, 3), jnp.float32), alive),
        jnp.ones((sq, 3), jnp.float32),
        jnp.asarray([True] * 5 + [False] * (sq - 5)), max_append=sq)
    assert not bool(sat_win)
    assert bool(sat_cap)
    assert int(jnp.sum(state.alive)) == sc  # filled to capacity
