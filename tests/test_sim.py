"""Tests for the batched JAX vessel-growth simulation."""
import numpy as np
import pytest

from octa_tpu.sim import greenhouse as gh

CONFIG = {
    "SimulationSpace": {"no_voxel_x": 1, "no_voxel_y": 1,
                        "no_voxel_z": 0.0131},
    "d": 0.1, "r": 0.0025,
    "FAZ_radius_bound": [0.44, 0.04],
    "rotation_radius": 1.05,
    "FAZ_center": [0.5, 0.5],
    "nerve_center": [10.56, 5.16],
    "nerve_radius": 0.3,
    "param_scale": 3,
    "modes": [
        {"name": "SVC", "I": 12, "N": 500, "eps_n": 0.18, "eps_s": 0.135,
         "eps_k": 0.135, "delta_art": 0.2925, "delta_ven": 0.2925,
         "gamma_art": 50, "gamma_ven": 50, "phi": 15, "omega": 0.3,
         "kappa": 2.55, "delta_sigma": 0.02},
        {"name": "DVC", "I": 6, "N": 500, "eps_n": 0.09, "eps_s": 0.0675,
         "eps_k": 0.0675, "delta_art": 0.14625, "delta_ven": 0.14625,
         "gamma_art": 90, "gamma_ven": 90, "phi": 15, "omega": 0,
         "kappa": 2.9, "delta_sigma": 0.02},
    ],
}
FOREST = {"type": "stumps", "N_trees": 4,
          "source_walls": {"x0": True, "x1": True, "y0": True, "y1": True,
                           "z0": False, "z1": False}}


@pytest.fixture(scope="module")
def grown():
    g = gh.Greenhouse(CONFIG, node_capacity=2048, sink_capacity=1024, seed=1)
    state = g.develop_forest(FOREST, batch=2)
    return g, state


def test_forest_grows(grown):
    g, state = grown
    n_art = np.asarray(state.art.n_nodes)
    n_ven = np.asarray(state.ven.n_nodes)
    assert n_art.shape == (2,)
    # started with 2 nodes per tree * 4 trees = 8; must have grown
    assert (n_art > 30).all(), n_art
    assert (n_ven >= 8).all(), n_ven
    # batch members differ (independent RNG)
    assert n_art[0] != n_art[1] or n_ven[0] != n_ven[1]


def test_positions_and_radii_sane(grown):
    g, state = grown
    for b in range(2):
        edges = gh.forest_to_edges(state.art, b)
        pos = edges["node1"]
        n = np.asarray(state.art.n_nodes)[b]
        assert len(edges["radius"]) == n - 4  # all non-root nodes have edges
        assert np.isfinite(pos).all()
        # nodes stay roughly inside the unit slab (growth can overshoot a bit)
        assert (pos[:, :2] > -0.2).all() and (pos[:, :2] < 1.2).all()
        assert (edges["radius"] > 0).all()


def test_murray_radius_monotonic(grown):
    """Parent radius >= child radius after Murray sweeps."""
    g, state = grown
    f = state.art
    n = int(np.asarray(f.n_nodes)[0])
    parent = np.asarray(f.parent[0])[:n]
    radius = np.asarray(f.radius[0])[:n]
    is_root = np.asarray(f.is_root[0])[:n]
    # roots keep r_0 (the reference never Murray-updates them)
    child = (parent >= 0) & ~is_root[np.clip(parent, 0, n - 1)]
    assert (radius[parent[child]] >= radius[child] - 1e-5).mean() > 0.99


def test_tree_structure_consistency(grown):
    g, state = grown
    f = state.art
    n = int(np.asarray(f.n_nodes)[0])
    parent = np.asarray(f.parent[0])[:n]
    n_children = np.asarray(f.n_children[0])[:n]
    # parents always created before children
    idx = np.arange(n)
    assert (parent < idx)[parent >= 0].all()
    # n_children consistent with parent pointers
    counted = np.bincount(parent[parent >= 0], minlength=n)
    np.testing.assert_array_equal(counted, n_children)
    assert (n_children <= 2).all()


def test_faz_clearing(grown):
    """The FAZ disc should stay (mostly) vessel-free."""
    g, state = grown
    f = state.art
    n = int(np.asarray(f.n_nodes)[0])
    pos = np.asarray(f.pos[0])[:n]
    faz_r = float(np.asarray(state.faz_radius[0]))
    d = np.linalg.norm(pos[:, :2] - 0.5, axis=-1)
    # voxel-quantized FAZ disc of radius faz_r*0.5 has few nodes inside
    inside = (d < faz_r * 0.4).mean()
    assert inside < 0.05, inside


def test_csv_export_roundtrip(grown, tmp_path):
    from octa_tpu.ops import raster

    g, state = grown
    art = gh.forest_to_edges(state.art, 0)
    ven = gh.forest_to_edges(state.ven, 0)
    path = str(tmp_path / "sample.csv")
    gh.save_edges_csv([art, ven], path)
    arrays = raster.parse_graph_csv(path)
    assert len(arrays["radius"]) == len(art["radius"]) + len(ven["radius"])
    img, _ = raster.rasterize_forest(arrays, [64, 64], 2)
    assert img.max() > 100  # vessels rendered


def test_capacity_ceiling_warns():
    """Saturating at the configured capacity ceiling must WARN, never
    silently truncate (the reference's sink list is unbounded,
    greenhouse.py:319-341); below the ceiling, staging redoes the segment
    and the run stays warning-free (covered by the module fixture)."""
    import warnings

    g = gh.Greenhouse(CONFIG, node_capacity=2048, sink_capacity=256, seed=1)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        g.develop_forest(FOREST, batch=1)
    msgs = [x for x in w if x.category is RuntimeWarning
            and "capacity ceiling" in str(x.message)]
    assert msgs, "expected a truncation RuntimeWarning at the sink ceiling"


def test_nerve_disc_carved_from_sampling():
    """Candidates inside the optic-nerve disc must be rejected
    (reference simulation_space.py:45-49)."""
    import jax
    import jax.numpy as jnp
    from octa_tpu.sim.greenhouse import _sample_candidates

    nerve_c = jnp.asarray([0.5, 0.5])
    pos, valid = _sample_candidates(
        jax.random.PRNGKey(0), 4000, jnp.asarray([0.1, 0.1]),
        jnp.float32(0.0), 1 / 76, nerve_center=nerve_c, nerve_radius=0.2)
    d = np.linalg.norm(np.asarray(pos[:, :2]) - 0.5, axis=-1)
    inside = d < 0.18  # margin inside the disc (voxel-quantized test)
    assert inside.sum() > 50  # sanity: the region was sampled at all
    assert not np.asarray(valid)[inside].any()


def test_geometry_mask_sampling():
    """A .npy geometry mask drives candidate validity when provided."""
    import jax
    import jax.numpy as jnp
    from octa_tpu.sim.greenhouse import _sample_candidates

    mask = np.ones((76, 76), bool)
    mask[:38] = False  # left half invalid
    pos, valid = _sample_candidates(
        jax.random.PRNGKey(1), 4000, jnp.asarray([0.5, 0.5]),
        jnp.float32(0.3), 1 / 76, geometry=jnp.asarray(mask))
    x = np.asarray(pos[:, 0])
    v = np.asarray(valid)
    assert not v[x < 0.49].any()
    assert v[x > 0.51].mean() > 0.95


def test_murray_uses_per_node_kappa():
    """Radius relaxation must use the PARENT node's creation kappa
    (reference arterial_tree.py:32,180: every Node stores the kappa it was
    created with; optimize_edge_radius_to_root computes
    (sum r_c^self.kappa)^(1/self.kappa) on the parent). Mixed-kappa
    schedules (the docker SVC 2.55 / DVC 2.9 flagship) hit this."""
    import jax.numpy as jnp

    # root(0) -> p(1, kappa=2.55) -> children 2,3 (kappa=2.9, pkappa=2.55)
    nc = 8
    f = gh.ForestState(
        pos=jnp.zeros((nc, 3)),
        radius=jnp.asarray([1.0, 0.5, 0.2, 0.3, 0, 0, 0, 0], jnp.float32),
        parent=jnp.asarray([-1, 0, 1, 1, -1, -1, -1, -1], jnp.int32),
        first_child=jnp.asarray([1, 2, -1, -1, -1, -1, -1, -1], jnp.int32),
        n_children=jnp.asarray([1, 2, 0, 0, 0, 0, 0, 0], jnp.int32),
        is_root=jnp.asarray([1, 0, 0, 0, 0, 0, 0, 0], bool),
        n_nodes=jnp.int32(4),
        kappa=jnp.asarray([4.0, 2.55, 2.9, 2.9, 4, 4, 4, 4], jnp.float32),
        pkappa=jnp.asarray([4.0, 4.0, 2.55, 2.55, 4, 4, 4, 4], jnp.float32),
    )
    out = gh.murray_sweep(f, 1)
    want = (0.2 ** 2.55 + 0.3 ** 2.55) ** (1 / 2.55)  # parent's kappa
    got = float(out.radius[1])
    assert abs(got - want) < 1e-6, (got, want)
    wrong = (0.2 ** 2.9 + 0.3 ** 2.9) ** (1 / 2.9)
    assert abs(got - wrong) > 1e-3  # distinguishes from child-kappa use
    # leaves and the root keep their radii
    assert float(out.radius[0]) == 1.0
    assert float(out.radius[2]) == pytest.approx(0.2)


def test_nerve_forest_initialization():
    """'nerve' init (reference forest.py:38-66): all roots inside the
    optic-nerve disc (uniform via sqrt-radius), z in [0, size_z], first
    segments in-plane with length d0; the forest then grows."""
    # an in-FOV optic nerve (CONFIG's sits outside the unit space, the
    # carve-gated case): center (0.9, 0.9), radius 0.1 after param_scale
    cfg = dict(CONFIG, nerve_center=[2.7, 2.7], nerve_radius=0.3)
    forest = {"type": "nerve", "N_trees": 6}
    g = gh.Greenhouse(cfg, node_capacity=2048, sink_capacity=1024, seed=3)
    state = g.init_state(forest, rng_seed=3)
    nc = np.asarray(cfg["nerve_center"], np.float32) / cfg["param_scale"]
    nr = cfg["nerve_radius"] / cfg["param_scale"]
    for f in (state.art, state.ven):
        n = int(np.asarray(f.n_nodes))
        assert n == 2 * forest["N_trees"]
        pos = np.asarray(f.pos)[:n]
        roots = np.asarray(f.is_root)[:n]
        assert roots.sum() == forest["N_trees"]
        rp = pos[roots]
        # packed in the disc — note the reference's swapped center
        # components (x ~ nerve_center[1], y ~ nerve_center[0])
        d = np.hypot(rp[:, 0] - nc[1], rp[:, 1] - nc[0])
        assert (d <= nr + 1e-6).all(), d
        assert (rp[:, 2] >= 0).all() and (rp[:, 2] <= g.sizes[2]).all()
        # stump segments: in-plane, length d0
        sp = pos[~roots]
        seg = sp - rp
        assert np.allclose(seg[:, 2], 0.0)
        assert np.allclose(np.linalg.norm(seg, axis=1), g.d, rtol=1e-5)
        # radii initialized to r0 on roots and stumps
        assert np.allclose(np.asarray(f.radius)[:n], g.r)
    # and the grown forest is viable end-to-end
    out = g.develop_forest(forest, batch=1)
    assert int(np.asarray(out.art.n_nodes)[0]) > 2 * forest["N_trees"]


def test_bundled_geometry_asset_loads_and_grows():
    """The shipped sampling-geometry asset (reference
    ``geometries/slab_oxy_sample_3mm.npy``, loaded by
    ``simulation_space.py:29-37``) drives the docker-schedule growth via
    ``SimulationSpace.oxygen_sample_geometry_path``."""
    import os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(gh.__file__))), "sim", "geometries",
        "slab_oxy_sample_3mm.npy")
    assert os.path.exists(path), path
    geo = np.load(path)
    assert geo.shape == (76, 76, 1) and geo.dtype == bool
    # FAZ voxels are carved out, the rest is open
    assert 0.97 < geo.mean() < 1.0
    cfg = dict(CONFIG)
    cfg["SimulationSpace"] = dict(
        CONFIG["SimulationSpace"], oxygen_sample_geometry_path=path)
    g = gh.Greenhouse(cfg, node_capacity=2048, sink_capacity=1024, seed=5)
    assert g.geometry is not None and g.geometry.shape == (76, 76)
    assert g.sizes[0] == 1.0 and g.sizes[2] == pytest.approx(1 / 76)
    out = g.develop_forest(FOREST, batch=1)
    assert int(np.asarray(out.art.n_nodes)[0]) > 30


def test_nerve_forest_requires_nerve_config():
    cfg = {k: v for k, v in CONFIG.items()
           if k not in ("nerve_center", "nerve_radius")}
    g = gh.Greenhouse(cfg, node_capacity=2048, sink_capacity=1024, seed=3)
    with pytest.raises(ValueError, match="nerve_center"):
        g.init_state({"type": "nerve", "N_trees": 2}, rng_seed=0)
