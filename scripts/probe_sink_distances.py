"""One-off probe: distance distribution of alive sinks to active nodes at
the END of the docker schedule — decides whether bound-based active-sink
compaction can pay (what fraction of alive sinks is within delta / within
delta + k*d of an active node).

Usage: python scripts/probe_sink_distances.py [batch]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml

import jax
import jax.numpy as jnp

from octa_tpu.sim import greenhouse as gh

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
cfg = yaml.safe_load(open("docker/vessel_graph_gen_docker_config.yml"))
g = gh.Greenhouse(cfg["Greenhouse"], seed=0)
state = g.develop_forest(cfg["Forest"], batch=batch)

mp = g.modes[-1]
sigma = float(np.asarray(state.sigma_t)[0])
denom = g.param_scale * sigma
delta = mp.delta_art / denom
eps_k = mp.eps_k / denom
d_step = max(float(np.asarray(state.d_cur)[0]), 0.04 / g.param_scale)
print(f"final sigma={sigma:.2f} delta={delta:.4f} eps_k={eps_k:.4f} "
      f"d={d_step:.4f}")


def dists(sample):
    st = jax.tree.map(lambda x: x[sample], state)
    for name, sinks, forest in (("oxy->art", st.oxy, st.art),
                                ("co2->ven", st.co2, st.ven)):
        nc = forest.pos.shape[0]
        exists = jnp.arange(nc) < forest.n_nodes
        active = exists & (forest.n_children < 2)
        d, _ = gh._chunked_nearest(sinks.pos, forest.pos, active)
        d = np.asarray(d)
        alive = np.asarray(sinks.alive)
        da = d[alive]
        n = len(da)
        if not n:
            continue
        fr = [float((da <= delta * k).mean()) for k in (1, 2, 4, 8)]
        print(f"  {name}: alive={n} frac within delta={fr[0]:.3f} "
              f"2delta={fr[1]:.3f} 4delta={fr[2]:.3f} 8delta={fr[3]:.3f} "
              f"median={np.median(da)/delta:.1f}x delta")


for s in range(2):
    print(f"sample {s}:")
    dists(s)
