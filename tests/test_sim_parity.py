"""Statistical parity of the JAX growth engine vs the *reference* greenhouse
(run via the anytree shim). Short runs, several seeds; asserts that node
counts and radius distributions land in the same regime — and that alive
sink counts match at the END of the schedule (including a DVC tail, where
the reference's unbounded sink list grows fastest,
reference greenhouse.py:319-341)."""
import copy
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")
from tests.anytree_shim import install as _install_anytree

_install_anytree()

CFG = {
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
        {"name": "SVC", "I": 20, "N": 1500, "eps_n": 0.18, "eps_s": 0.135,
         "eps_k": 0.135, "delta_art": 0.2925, "delta_ven": 0.2925,
         "gamma_art": 50, "gamma_ven": 50, "phi": 15, "omega": 0.3,
         "kappa": 2.55, "delta_sigma": 0.02},
    ],
}
# SVC + DVC schedule (docker-style mode sequence at reduced iteration
# counts): exercises the mode switch and the late-DVC sink accumulation.
CFG_DVC = copy.deepcopy(CFG)
CFG_DVC["modes"].append(
    {"name": "DVC", "I": 10, "N": 1500, "eps_n": 0.09, "eps_s": 0.0675,
     "eps_k": 0.0675, "delta_art": 0.14625, "delta_ven": 0.14625,
     "gamma_art": 90, "gamma_ven": 90, "phi": 15, "omega": 0,
     "kappa": 2.9, "delta_sigma": 0.02})
FOREST = {"type": "stumps", "N_trees": 8,
          "source_walls": {"x0": True, "x1": True, "y0": True, "y1": True,
                           "z0": False, "z1": False}}
N_SEEDS = 4


def _run_reference(cfg, n_seeds):
    import random

    from vessel_graph_generation.forest import Forest
    from vessel_graph_generation.greenhouse import Greenhouse

    arts, oxys, radii = [], [], []
    for seed in range(n_seeds):
        np.random.seed(seed)
        random.seed(seed)
        gh = Greenhouse(dict(cfg))
        art = Forest(FOREST, gh.d, gh.r, gh.simspace,
                     nerve_center=gh.nerve_center,
                     nerve_radius=gh.nerve_radius)
        ven = Forest(FOREST, gh.d, gh.r, gh.simspace, arterial=False,
                     nerve_center=gh.nerve_center,
                     nerve_radius=gh.nerve_radius)
        gh.set_forests(art, ven)
        gh.develop_forest()
        arts.append(gh.art_nodes_per_step[-1])
        oxys.append(gh.oxys_per_step[-1])
        radii.extend(n.radius for t in art.get_trees()
                     for n in t.get_tree_iterator(exclude_root=True))
    return np.array(arts), np.array(oxys), np.array(radii)


def _run_ours(cfg, n_seeds):
    from octa_tpu.sim import greenhouse as gh

    g = gh.Greenhouse(cfg, node_capacity=4096, sink_capacity=4096, seed=100)
    st, stats = g.develop_forest(FOREST, batch=n_seeds, collect_stats=True)
    arts = np.asarray(st.art.n_nodes)
    oxys = np.asarray(stats)[:, -1, 2]
    radii = []
    for b in range(n_seeds):
        e = gh.forest_to_edges(st.art, b)
        radii.extend(e["radius"].tolist())
    return arts, oxys, np.array(radii)


@pytest.mark.slow
def test_growth_statistics_match_reference():
    ref_counts, ref_oxys, ref_radii = _run_reference(CFG, N_SEEDS)
    our_counts, our_oxys, our_radii = _run_ours(CFG, N_SEEDS)
    ref_mean, our_mean = ref_counts.mean(), our_counts.mean()
    assert abs(our_mean - ref_mean) / ref_mean < 0.35, (
        f"node count mismatch: ours {our_counts} vs ref {ref_counts}")
    # alive oxygen-sink accumulation (accept minus satisfy balance);
    # measured at SVC-40 on the docker schedule: ref 870, ours 856-880
    assert abs(our_oxys.mean() - ref_oxys.mean()) / ref_oxys.mean() < 0.25, (
        f"oxy sink mismatch: ours {our_oxys} vs ref {ref_oxys}")
    # radius distributions: same median, comparable upper quantile
    assert abs(np.median(our_radii) - np.median(ref_radii)) < 1e-4
    q90r, q90o = np.quantile(ref_radii, 0.9), np.quantile(our_radii, 0.9)
    assert abs(q90o - q90r) / q90r < 0.3, (q90r, q90o)


@pytest.mark.slow
def test_end_of_dvc_sink_counts_match_reference():
    """Alive sink counts at the END of a DVC tail (not just mid-SVC):
    verifies that staged sink capacity keeps every sink the reference's
    unbounded list would keep, through the mode switch and the omega=0
    DVC regime where sinks accumulate fastest."""
    n = 2  # the in-process reference engine is slow; 2 seeds bound runtime
    ref_counts, ref_oxys, _ = _run_reference(CFG_DVC, n)
    our_counts, our_oxys, _ = _run_ours(CFG_DVC, n)
    assert abs(our_oxys.mean() - ref_oxys.mean()) / ref_oxys.mean() < 0.25, (
        f"end-of-DVC oxy sink mismatch: ours {our_oxys} vs ref {ref_oxys}")
    ref_mean, our_mean = ref_counts.mean(), our_counts.mean()
    assert abs(our_mean - ref_mean) / ref_mean < 0.35, (
        f"node count mismatch: ours {our_counts} vs ref {ref_counts}")
