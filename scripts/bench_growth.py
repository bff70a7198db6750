"""Growth-only microbenchmark: time develop_forest on the real TPU.

Usage: python scripts/bench_growth.py [batch] [config.yml]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import yaml

import jax
import jax.numpy as jnp

from octa_tpu.sim import greenhouse as gh

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
cfg_path = sys.argv[2] if len(sys.argv) > 2 else "configs/vessel_graph_gen.yml"

sim_cfg = yaml.safe_load(open(cfg_path))
g = gh.Greenhouse(sim_cfg["Greenhouse"], seed=0)
print("backend:", jax.default_backend(), "devices:", jax.devices())

# warmup (compiles all segments)
t0 = time.perf_counter()
state = g.develop_forest(sim_cfg["Forest"], batch=batch)
print("warmup+compile:", round(time.perf_counter() - t0, 2), "s",
      "nodes:", int(jnp.max(state.art.n_nodes)))
del state

for trial in range(2):
    g.seed = 100 + trial
    t0 = time.perf_counter()
    state = g.develop_forest(sim_cfg["Forest"], batch=batch)
    _ = float(jnp.sum(state.art.pos))
    dt = time.perf_counter() - t0
    print(f"trial {trial}: {dt:.2f}s total, {dt/batch*1000:.1f} ms/sample, "
          f"max nodes {int(jnp.max(state.art.n_nodes))}")
    del state
