"""One-off probe: the geometry numbers that size a binned nearest scan.

Reports, over the docker schedule:
  - per-iteration delta_art/delta_ven/eps_k (analytic sigma schedule) vs a
    candidate static row height 1/G,
  - per-iteration node/sink counts and the per-iteration emission count
    (how fast an unsorted "fresh tail" grows between re-binning points),
  - final active-node fraction (n_children < 2) per forest — the share of
    scanned points that a compacted/binned candidate set could drop,
  - final per-row occupancy for G in {16, 32, 64} (y-binning): the dense
    window a 3-row scan would touch.

Usage: OCTA_TPU_PLATFORM=cpu python scripts/probe_growth_geometry.py [batch]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2

import jax.numpy as jnp  # noqa: E402

from octa_tpu.sim import greenhouse as gh  # noqa: E402

cfg = yaml.safe_load(open("docker/vessel_graph_gen_docker_config.yml"))
g = gh.Greenhouse(cfg["Greenhouse"], seed=0)
state, stats = g.develop_forest(cfg["Forest"], batch=batch,
                                collect_stats=True)
stats = np.asarray(stats)  # [B, T, 5]: n_art, n_ven, alive_oxy, alive_co2, sigma

# analytic parameter schedule (sigma resets per mode, d compounds)
rows = []
for mp in g.modes:
    for i in range(mp.I):
        sigma = 1.0 + i * mp.delta_sigma
        denom = 1.0 if i == 0 else g.param_scale * sigma
        rows.append((mp.delta_art / denom, mp.delta_ven / denom,
                     mp.eps_k / denom))
rows = np.asarray(rows)
t = np.arange(len(rows))
n_art = stats[:, :, 0].max(0)
emit = np.diff(np.concatenate([[n_art[0]], n_art]))
print("iter  delta_art  delta_ven   eps_k   maxN_art  emit/it")
for i in range(0, len(rows), 25):
    print(f"{i:4d}  {rows[i, 0]:9.4f}  {rows[i, 1]:9.4f}  {rows[i, 2]:7.4f}"
          f"  {n_art[i]:8.0f}  {emit[max(i - 24, 0):i + 1].mean():7.1f}")
print(f"max per-iteration emission (art): {emit.max():.0f}; "
      f"p99 {np.percentile(emit, 99):.0f}")
for G in (16, 32, 64):
    n_ok = int((rows[:, 0] <= 1.0 / G).argmax()) if (
        rows[:, 0] <= 1.0 / G).any() else len(rows)
    print(f"G={G}: delta_art fits one row from iteration {n_ok} "
          f"(of {len(rows)}); nodes then: {n_art[min(n_ok, len(n_art)-1)]:.0f}")

for name, f in (("art", state.art), ("ven", state.ven)):
    pos = np.asarray(f.pos)            # [B, NC, 3]
    nn = np.asarray(f.n_nodes)         # [B]
    nch = np.asarray(f.n_children)
    for b in range(min(batch, 2)):
        ex = np.arange(pos.shape[1]) < nn[b]
        act = ex & (nch[b] < 2)
        print(f"{name}[{b}]: nodes {nn[b]}, active {act.sum()} "
              f"({100 * act.sum() / max(nn[b], 1):.0f}%)")
        for G in (16, 32, 64):
            iy = np.clip((pos[b, ex, 1] * G).astype(int), 0, G - 1)
            occ = np.bincount(iy, minlength=G)
            print(f"   G={G}: row occupancy mean {occ.mean():.0f} "
                  f"max {occ.max()} (3-row window max {max(occ[i:i+3].sum() for i in range(G-2))})")
