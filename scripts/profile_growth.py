"""Profile the growth loop on the real TPU and print an op-level breakdown.

Runs one warm ``develop_forest`` under ``jax.profiler.trace``, then parses
the captured xplane with a locally protoc-compiled copy of the (public,
stable) XSpace schema — the installed tensorboard profile plugin's
generated protos are incompatible with this image's protobuf/tensorflow.

Usage: python scripts/profile_growth.py [batch] [config.yml]
"""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import yaml

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
cfg_path = (sys.argv[2] if len(sys.argv) > 2
            else "docker/vessel_graph_gen_docker_config.yml")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from octa_tpu.sim import greenhouse as gh  # noqa: E402

sim_cfg = yaml.safe_load(open(cfg_path))
g = gh.Greenhouse(sim_cfg["Greenhouse"], seed=0)
print("backend:", jax.default_backend())

# Warm up: full develop (compiles all segments).
state = g.develop_forest(sim_cfg["Forest"], batch=batch)
_ = float(jnp.sum(state.art.pos))
print("warmup done, max nodes", int(jnp.max(state.art.n_nodes)))
del state

logdir = "/tmp/growth_trace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    state = g.develop_forest(sim_cfg["Forest"], batch=batch)
    _ = float(jnp.sum(state.art.pos))
del state

xs = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplanes:", xs)
if not xs:
    sys.exit("no trace captured")

XPLANE_PROTO = """
syntax = "proto3";
package profparse;
message XSpace { repeated XPlane planes = 1; }
message XPlane {
  int64 id = 1; string name = 2; repeated XLine lines = 3;
  map<int64, XEventMetadata> event_metadata = 4;
  map<int64, XStatMetadata> stat_metadata = 5; repeated XStat stats = 6;
}
message XLine {
  int64 id = 1; int64 display_id = 10; string name = 2;
  string display_name = 11; int64 timestamp_ns = 3; int64 duration_ps = 9;
  repeated XEvent events = 4;
}
message XEvent {
  int64 metadata_id = 1;
  oneof data { int64 offset_ps = 2; int64 num_occurrences = 5; }
  int64 duration_ps = 3; repeated XStat stats = 4;
}
message XStat {
  int64 metadata_id = 1;
  oneof value { double double_value = 2; uint64 uint64_value = 3;
    int64 int64_value = 4; string str_value = 5; bytes bytes_value = 6;
    uint64 ref_value = 7; }
}
message XEventMetadata {
  int64 id = 1; string name = 2; bytes metadata = 3; string display_name = 4;
  repeated XStat stats = 5; repeated int64 child_id = 6;
}
message XStatMetadata { int64 id = 1; string name = 2; string description = 3; }
"""


def parse_xplane(path: str, top: int = 30) -> None:
    import subprocess
    import tempfile
    from collections import defaultdict

    d = tempfile.mkdtemp(prefix="xplane_pb_")
    with open(os.path.join(d, "xplane.proto"), "w") as f:
        f.write(XPLANE_PROTO)
    subprocess.run(["protoc", "--python_out=.", "xplane.proto"],
                   cwd=d, check=True)
    sys.path.insert(0, d)
    import xplane_pb2

    spc = xplane_pb2.XSpace()
    spc.ParseFromString(open(path, "rb").read())
    for p in spc.planes:
        if "TPU" not in p.name:
            continue
        ev = p.event_metadata
        for line in p.lines:
            if line.name not in ("XLA Ops", "Async XLA Ops"):
                continue
            tot = defaultdict(float)
            cnt = defaultdict(int)
            total = 0.0
            for e in line.events:
                nm = ev[e.metadata_id].name
                tot[nm] += e.duration_ps / 1e12
                cnt[nm] += 1
                total += e.duration_ps / 1e12
            print(f"== '{p.name}' / '{line.name}': {len(line.events)} "
                  f"events, busy {total:.2f}s (while-ops nest: leaves only)")
            for nm, v in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
                print(f"   {v:8.3f}s x{cnt[nm]:7d}  {nm[:110]}")


parse_xplane(xs[0])
