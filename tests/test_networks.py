import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octa_tpu.models.dynunet import DynUNet
from octa_tpu.models.nice_gan_nets import NiceDiscriminator, NiceResnetGenerator
from octa_tpu.models.resnet_gan import (
    NegativeGenerator,
    PatchSampleF,
    patchGAN70x70,
    resnetGenerator9,
)


def _nparams(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def test_dynunet_shapes_and_params():
    net = DynUNet(
        spatial_dims=2, in_channels=1, out_channels=1,
        kernel_size=[3, 3, 3, 3, 3], strides=[1, 2, 2, 2, 1],
        upsample_kernel_size=[1, 2, 2, 2, 1],
    )
    x = jnp.zeros((1, 64, 64, 1))
    variables = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(variables, x)
    assert y.shape == (1, 64, 64, 1)
    # MONAI DynUNet with this config has 5.44M parameters (nnU-Net filters
    # [32,64,128,256,320], 2 convs per block, transp-conv upsampling).
    n = _nparams(variables["params"])
    assert 5.3e6 < n < 5.6e6, f"param count {n}"


def test_dynunet_multichannel_3d_recon_head():
    # 3D reconstruction config: out_channels=44 on 2D inputs
    net = DynUNet(spatial_dims=2, in_channels=1, out_channels=44,
                  kernel_size=[3, 3, 3, 3, 3], strides=[1, 2, 2, 2, 1],
                  upsample_kernel_size=[1, 2, 2, 2, 1])
    x = jnp.zeros((2, 32, 32, 1))
    v = net.init(jax.random.PRNGKey(0), x)
    assert net.apply(v, x).shape == (2, 32, 32, 44)


def test_resnet_generator_shapes():
    net = resnetGenerator9()
    x = jnp.zeros((1, 64, 64, 1))
    v = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(v, x)
    assert y.shape == (1, 64, 64, 1)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0  # sigmoid head
    # reference resnetGenerator9 (torch) has 11.378M params
    n = _nparams(v["params"])
    assert abs(n - 11_378_049) < 60_000, f"param count {n}"


def test_resnet_generator_encode_only_taps():
    net = resnetGenerator9()
    x = jnp.zeros((1, 64, 64, 1))
    v = net.init(jax.random.PRNGKey(0), x)
    feats = net.apply(v, x, layers=[0, 4, 8, 12, 16], encode_only=True)
    assert len(feats) == 5
    assert feats[0].shape[1] == 70  # reflect-padded input, 64 + 2*3
    assert feats[1].shape[-1] == 128  # first down conv output
    assert feats[2].shape[-1] == 256  # second down conv output
    assert feats[3].shape[-1] == 256  # resblock 0
    assert feats[4].shape[-1] == 256  # resblock 4


def test_patchgan_discriminator():
    net = patchGAN70x70()
    x = jnp.zeros((2, 304, 304, 1))
    v = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(v, x)
    assert y.shape[0] == 2 and y.shape[-1] == 1
    # 70x70 patchGAN at 304**2: 3 stride-2 stages -> ~38x38 logit map
    assert 30 <= y.shape[1] <= 40
    n = _nparams(v["params"])
    assert abs(n - 2_764_737) < 30_000, f"param count {n}"


def test_patch_sample_f():
    net = PatchSampleF(nc=256)
    feats = [jnp.ones((2, 16, 16, 128)), jnp.ones((2, 8, 8, 256))]
    ids = [jnp.arange(64), jnp.arange(64)]
    v = net.init(jax.random.PRNGKey(0), feats, ids, 64)
    out, out_ids = net.apply(v, feats, ids, 64)
    assert out[0].shape == (2 * 64, 256)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out[0]), axis=-1), 1.0, rtol=1e-4
    )


def test_negative_generator():
    net = NegativeGenerator(nc=256, z_dim=64)
    feats = [jnp.ones((2, 16, 16, 256))]
    v = net.init(jax.random.PRNGKey(0), feats, 64, jax.random.PRNGKey(1))
    out = net.apply(v, feats, 64, jax.random.PRNGKey(2))
    assert out[0].shape == (2 * 64, 256)


def test_nice_gan_nets():
    disc = NiceDiscriminator(input_nc=1, ndf=64, n_layers=7)
    x = jnp.zeros((1, 64, 64, 1))
    v = disc.init(jax.random.PRNGKey(0), x)
    out0, out1, cam, heat, z = disc.apply(
        v, x, mutable=["spectral"]
    )[0]
    assert z.shape == (1, 16, 16, 128)
    assert cam.shape == (1, 1)
    gen = NiceResnetGenerator(ngf=64, n_blocks=6, img_size=64, light=True)
    vg = gen.init(jax.random.PRNGKey(0), z)
    y = gen.apply(vg, z)
    assert y.shape == (1, 64, 64, 1)


@pytest.mark.parametrize("stride_cfg", [[1, 2, 2, 2, 1], [1, 2, 2, 2, 2]])
def test_dynunet_alt_strides(stride_cfg):
    net = DynUNet(strides=stride_cfg, kernel_size=[3] * 5,
                  upsample_kernel_size=stride_cfg)
    x = jnp.zeros((1, 32, 32, 1))
    v = net.init(jax.random.PRNGKey(0), x)
    assert net.apply(v, x).shape == (1, 32, 32, 1)
