"""Banded-scan A/B on the real TPU: perf + statistical parity in one run.

Grows the same seeds with OCTA_TPU_BANDED unset (full scans) and =1
(y-sorted restage + block-pruned kernel, greenhouse._banded) in the SAME
process via a fresh Greenhouse per arm (the env is read at trace time, and
each arm's jit cache is private to its Greenhouse instance... it is NOT —
_restage_spatial and the kernels are module-jitted, but their traced
programs differ by the env only through which functions are CALLED, which
is decided in this process per-arm at trace time; so arms must run in
SEPARATE processes). This driver therefore re-execs itself per arm.

Usage: python scripts/probe_banded_ab.py [batch] [config.yml]
"""
import json
import os
import subprocess
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
cfg_path = (sys.argv[2] if len(sys.argv) > 2
            else "docker/vessel_graph_gen_docker_config.yml")


def run_arm(banded: bool, bf16: bool = False):
    env = dict(os.environ)
    env.pop("OCTA_TPU_BANDED", None)
    env.pop("OCTA_TPU_PEN_BF16", None)
    if banded:
        env["OCTA_TPU_BANDED"] = "1"
    if bf16:
        env["OCTA_TPU_PEN_BF16"] = "1"
    code = f"""
import json, time, sys
sys.path.insert(0, {repo!r})
import yaml
import jax, jax.numpy as jnp
import numpy as np
from octa_tpu.sim import greenhouse as gh

sim_cfg = yaml.safe_load(open({cfg_path!r}))
g = gh.Greenhouse(sim_cfg["Greenhouse"], seed=0)
t0 = time.perf_counter()
state = g.develop_forest(sim_cfg["Forest"], batch={batch})
_ = float(jnp.sum(state.art.pos))
warm = time.perf_counter() - t0
best = None
for trial in range(2):
    g.seed = 100
    t0 = time.perf_counter()
    state = g.develop_forest(sim_cfg["Forest"], batch={batch})
    _ = float(jnp.sum(state.art.pos))
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
n_art = np.asarray(state.art.n_nodes)
n_ven = np.asarray(state.ven.n_nodes)
rad = np.concatenate([
    np.asarray(jnp.where(jnp.arange(state.art.pos.shape[-2])[None]
                         < state.art.n_nodes[:, None],
                         state.art.radius, 0.0)).ravel(),
    np.asarray(jnp.where(jnp.arange(state.ven.pos.shape[-2])[None]
                         < state.ven.n_nodes[:, None],
                         state.ven.radius, 0.0)).ravel()])
print("RESULT " + json.dumps(dict(
    warm=round(warm, 2), best=round(best, 3),
    ms_per_sample=round(best / {batch} * 1000, 1),
    nodes_art=n_art.tolist(), nodes_ven=n_ven.tolist(),
    rad_sum=float(rad.sum()), rad_max=float(rad.max()))))
"""
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=1800)
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    print(r.stdout[-3000:], r.stderr[-3000:], sep="\n---\n")
    raise SystemExit(f"arm banded={banded} failed rc={r.returncode}")


base = run_arm(False)
print("full      :", base, flush=True)
band = run_arm(True)
print("banded    :", band, flush=True)

na_b, na_f = band["nodes_art"], base["nodes_art"]
rel = [abs(a - b) / max(b, 1) for a, b in zip(na_b, na_f)]
print(f"\nspeedup: {base['best'] / band['best']:.3f}x "
      f"({base['ms_per_sample']} -> {band['ms_per_sample']} ms/sample)")
print(f"node-count rel delta: max {max(rel):.4f} "
      f"(statistical-parity scale is ~0.001-0.01)")
print(f"radius sum rel delta: "
      f"{abs(band['rad_sum'] - base['rad_sum']) / base['rad_sum']:.5f}",
      flush=True)

# Second gate in the same window: bf16 penalties in the unbanded nearest
# kernel (OCTA_TPU_PEN_BF16, ops/pallas_nearest.py — halves the mask
# input's HBM write+read; banded kernels keep f32 pens). Measure it on
# top of each layout so whichever banded default wins has its bf16
# decision too.
for arm_banded, name in ((False, "full+bf16  "), (True, "banded+bf16")):
    ref = band if arm_banded else base
    b16 = run_arm(arm_banded, bf16=True)
    print(f"{name}:", b16, flush=True)
    rel16 = [abs(a - b) / max(b, 1)
             for a, b in zip(b16["nodes_art"], ref["nodes_art"])]
    print(f"  vs f32-pen: speedup {ref['best'] / b16['best']:.3f}x "
          f"({ref['ms_per_sample']} -> {b16['ms_per_sample']} ms/sample), "
          f"node rel delta max {max(rel16):.4f}", flush=True)
