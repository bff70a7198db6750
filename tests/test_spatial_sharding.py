"""Spatial (height-axis) sharding parity: the halo-exchanged DynUNet forward
over a (data, space) mesh must match the unsharded forward exactly in f32
(zero-filled ppermute edges == torch zero padding; psum'd InstanceNorm
moments == global moments). Runs on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from octa_tpu.models.dynunet import DynUNet
from octa_tpu.parallel.spatial import (dynunet_spatial_infer, halo_exchange,
                                       spatial_mesh)


@pytest.fixture(scope="module")
def model_and_vars():
    model = DynUNet(spatial_dims=2, in_channels=1, out_channels=1,
                    kernel_size=[3] * 5, strides=[1, 2, 2, 2, 1],
                    upsample_kernel_size=[1, 2, 2, 2, 1],
                    filters=[8, 16, 32, 64, 64])
    x = jnp.zeros((1, 64, 64, 1))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


def test_halo_exchange_matches_zero_pad():
    mesh = spatial_mesh(n_data=1, n_space=4)
    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 8, 3), np.float32))

    def locl(xx):
        return halo_exchange(xx, 1, 1, "space")

    out = jax.jit(jax.shard_map(
        locl, mesh=mesh, in_specs=jax.sharding.PartitionSpec(None, "space"),
        out_specs=jax.sharding.PartitionSpec(None, "space"),
        check_vma=False))(x)
    # each 8-row shard becomes 10 rows: [prev row | shard | next row]
    out = np.asarray(out).reshape(2, 4, 10, 8, 3)
    ref = np.pad(np.asarray(x), ((0, 0), (1, 1), (0, 0), (0, 0)))
    for s in range(4):
        np.testing.assert_array_equal(out[:, s], ref[:, s * 8:s * 8 + 10])


@pytest.mark.parametrize("n_data,n_space", [(1, 4), (2, 4), (1, 8)])
def test_sharded_dynunet_matches_unsharded(model_and_vars, n_data, n_space):
    model, variables = model_and_vars
    if n_data * n_space > len(jax.devices()):
        pytest.skip("not enough devices")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((n_data * 2, 128, 128, 1), np.float32))
    ref = model.apply(variables, x)
    mesh = spatial_mesh(n_data=n_data, n_space=n_space)
    out = dynunet_spatial_infer(model, variables, x, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_spatial_infer_rejects_odd_shard_heights():
    """ADVICE r1: a violating call must error, not return misaligned
    output (H % n_space == 0 but a stride-2 stage would see an odd
    per-shard height)."""
    import pytest

    from octa_tpu.models.dynunet import DynUNet
    from octa_tpu.parallel.spatial import dynunet_spatial_infer, spatial_mesh

    net = DynUNet(spatial_dims=2, in_channels=1, out_channels=1,
                  kernel_size=[3] * 5, strides=[1, 2, 2, 2, 1],
                  upsample_kernel_size=[1, 2, 2, 2, 1],
                  filters=[4, 8, 8, 16, 16])
    # H=104, n_space=4 -> shard 26 -> 13 after one stride-2: invalid
    x = jnp.zeros((2, 104, 64, 1), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x[:1, :16])
    mesh = spatial_mesh(n_data=2, n_space=4)
    with pytest.raises(ValueError, match="odd at stride-2"):
        dynunet_spatial_infer(net, variables, x, mesh)
