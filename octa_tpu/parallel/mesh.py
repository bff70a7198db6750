"""Device mesh + sharding utilities (replaces the reference's absent
distributed backend — SURVEY §2.9/§5.8: DP over ICI via jax.sharding).

The training step functions are jitted with parameters replicated and the
batch sharded over the ``data`` axis; XLA inserts the psum gradient
reductions (the pjit equivalent of DDP). Multi-chip logic is validated on a
virtual CPU mesh in tests and by the driver's ``dryrun_multichip``.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: int | None = None, batch_size: int | None = None) -> Mesh:
    """1D data-parallel mesh. If ``batch_size`` is given, use the largest
    device count that divides it (so batch 4 on 8 chips uses 4)."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if batch_size:
        while n > 1 and batch_size % n != 0:
            n -= 1
    return Mesh(np.array(devices[:n]), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put array entries of a batch dict, sharded on dim 0."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1:
            out[k] = jax.device_put(np.asarray(v), sh)
        else:
            out[k] = v
    return out
