"""Spatial (height-axis) sharding for full-resolution CNN inference.

The reference processes 1216² images whole on one device (SURVEY §5.7 —
"the analogous scaling axis is spatial"). This module shards the height
axis of NHWC activations over a ``space`` mesh axis with shard_map:

- 3x3 convs exchange one halo row with each neighbor over ICI
  (``jax.lax.ppermute``); a missing neighbor contributes zeros, which is
  exactly torch's zero padding at the global boundary. Results match the
  unsharded forward to float reduction-order tolerance (convs are
  element-exact; the psum'd norm moments may associate differently).
- stride-2 convs stay aligned because every shard keeps an even row count
  (H must be divisible by ``n_space * 2^n_downsamples``).
- k=2, s=2 transposed convs tile without overlap — no communication.
- InstanceNorm moments are psum-reduced over the space axis.

Model support is opt-in via an ``axis_name`` field (see
``octa_tpu.models.dynunet.DynUNet``): when set, convs/norms call the
primitives here. ``dynunet_spatial_infer`` is the turnkey wrapper.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def halo_exchange(x, up: int, down: int, axis_name: str, axis: int = 1):
    """Pad shard ``x`` along ``axis`` with ``up`` rows from the previous
    shard and ``down`` rows from the next (zeros at the global edges)."""
    n = jax.lax.axis_size(axis_name)
    h = x.shape[axis]
    parts = []
    if up:
        parts.append(jax.lax.ppermute(
            jax.lax.slice_in_dim(x, h - up, h, axis=axis),
            axis_name, [(i, i + 1) for i in range(n - 1)]))
    parts.append(x)
    if down:
        parts.append(jax.lax.ppermute(
            jax.lax.slice_in_dim(x, 0, down, axis=axis),
            axis_name, [(i, i - 1) for i in range(1, n)]))
    return jnp.concatenate(parts, axis=axis) if len(parts) > 1 else x


def spatial_mesh(n_data: int = 1, n_space: int | None = None,
                 data_axis: str = "data", space_axis: str = "space") -> Mesh:
    """(data, space) mesh over the first ``n_data * n_space`` devices."""
    devices = jax.devices()
    n_space = n_space or len(devices) // n_data
    dev = np.array(devices[:n_data * n_space]).reshape(n_data, n_space)
    return Mesh(dev, (data_axis, space_axis))


def dynunet_spatial_infer(model, variables, x, mesh: Mesh,
                          data_axis: str = "data",
                          space_axis: str = "space"):
    """Run ``model`` (a DynUNet) on global batch ``x`` [B, H, W, C] with the
    batch sharded over ``data_axis`` and H sharded over ``space_axis``.

    H must be divisible by ``n_space * 2^n_downsamples`` so every strided
    stage keeps whole, even-height shards (1216 over 4 ways: 304 -> 152 ->
    76 -> 38 per shard). Matches the unsharded forward to float
    reduction-order tolerance.
    """
    # Enforce the precondition instead of silently returning misaligned
    # outputs: every stride-2 stage must see an even per-shard height.
    n_space = dict(zip(mesh.axis_names, mesh.devices.shape))[space_axis]
    H = x.shape[1]
    if H % n_space:
        raise ValueError(
            f"spatial sharding: H={H} not divisible by n_space={n_space}")
    h = H // n_space
    for si, s in enumerate(getattr(model, "strides", [])):
        stride = s[0] if isinstance(s, (list, tuple)) else s
        if stride == 2:
            if h % 2:
                raise ValueError(
                    f"spatial sharding: per-shard height {h} is odd at "
                    f"stride-2 stage {si} (H={H}, n_space={n_space}); H "
                    f"must be divisible by n_space * 2^n_downsamples")
            h //= 2
    smodel = model.clone(axis_name=space_axis, s2d_threshold=1 << 30)

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(data_axis, space_axis)),
        out_specs=P(data_axis, space_axis), check_vma=False)
    def run(v, xx):
        return smodel.apply(v, xx)

    return run(variables, x)
