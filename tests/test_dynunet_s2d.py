"""DynUNet S2D fast path: exactness vs the direct path, and torch conv
semantics (stride-2 padding, ConvTranspose kernel flip) parity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from octa_tpu.models.dynunet import (
    DynUNet, space_to_depth, depth_to_space, _s2d_weights_s1,
    _s2d_weights_s2, _s2d_weights_transp,
)


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x))


def test_s2d_conv_transforms_exact(rng):
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 6)).astype(np.float32))
    dn = ("NHWC", "HWIO", "NHWC")
    ref1 = jax.lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                        dimension_numbers=dn)
    out1 = depth_to_space(jax.lax.conv_general_dilated(
        space_to_depth(x), _s2d_weights_s1(w), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=dn))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1), atol=1e-4)

    ref2 = jax.lax.conv_general_dilated(x, w, (2, 2), [(1, 1), (1, 1)],
                                        dimension_numbers=dn)
    out2 = jax.lax.conv_general_dilated(
        space_to_depth(x), _s2d_weights_s2(w), (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=dn)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=1e-4)


def test_s2d_transp_matches_flax_convtranspose(rng):
    from flax import linen as nn
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2, 2, 4, 6)).astype(np.float32))

    class T(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.ConvTranspose(6, (2, 2), strides=(2, 2),
                                    padding="SAME", use_bias=False, name="t")(x)

    ref = T().apply({"params": {"t": {"kernel": w}}}, x)
    dn = ("NHWC", "HWIO", "NHWC")
    out = depth_to_space(jax.lax.conv_general_dilated(
        x, _s2d_weights_transp(w), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=dn))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_dynunet_s2d_path_matches_direct(rng):
    net_direct = DynUNet(
        spatial_dims=2, in_channels=1, out_channels=1,
        kernel_size=[3] * 5, strides=[1, 2, 2, 2, 1],
        upsample_kernel_size=[1, 2, 2, 2, 1], s2d_threshold=10 ** 9)
    net_s2d = net_direct.clone(s2d_threshold=32)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 1)).astype(np.float32))
    params = net_direct.init(jax.random.PRNGKey(0), x)["params"]
    # identical parameter trees (names/shapes) in both modes
    p2 = net_s2d.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.map(jnp.shape, params) == jax.tree.map(jnp.shape, p2)
    y_direct = net_direct.apply({"params": params}, x)
    y_s2d = net_s2d.apply({"params": params}, x)
    np.testing.assert_allclose(
        np.asarray(y_s2d), np.asarray(y_direct), atol=2e-3)
    # gradients flow through the transformed kernels
    g = jax.grad(lambda p: jnp.sum(net_s2d.apply({"params": p}, x) ** 2))(
        params)
    gmax = max(float(jnp.abs(v).max()) for v in jax.tree.leaves(g))
    assert np.isfinite(gmax) and gmax > 0


def test_stride2_conv_matches_torch(rng):
    torch = pytest.importorskip("torch")
    from octa_tpu.models.dynunet import CanonConv
    x = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    w = rng.normal(size=(3, 3, 4, 6)).astype(np.float32)
    ty = torch.conv2d(
        torch.tensor(x.transpose(0, 3, 1, 2)),
        torch.tensor(w.transpose(3, 2, 0, 1)), stride=2, padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    conv = CanonConv(6, 3, 2, mode="direct")
    fy = conv.apply({"params": {"kernel": jnp.asarray(w)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(fy), ty, atol=1e-4)


def test_convtranspose_import_matches_torch(rng):
    torch = pytest.importorskip("torch")
    from flax import linen as nn
    from octa_tpu.io.checkpoints import _convT_iohw_to_hwio
    x = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    wt = rng.normal(size=(4, 6, 2, 2)).astype(np.float32)  # torch (in,out,k,k)
    ty = torch.conv_transpose2d(
        torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(wt), stride=2,
    ).numpy().transpose(0, 2, 3, 1)

    class T(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.ConvTranspose(6, (2, 2), strides=(2, 2),
                                    padding="SAME", use_bias=False, name="t")(x)

    w = jnp.asarray(_convT_iohw_to_hwio(wt))
    fy = T().apply({"params": {"t": {"kernel": w}}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(fy), ty, atol=1e-4)


def test_bf16_grads_both_paths(rng):
    """amp (bf16) training must differentiate through both conv paths —
    regression: preferred_element_type=f32 convs fail under autodiff with
    bf16 operands (mixed-dtype cotangent convs)."""
    import jax
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 1)).astype(np.float32))
    for thresh in (32, 10 ** 9):
        net = DynUNet(
            spatial_dims=2, in_channels=1, out_channels=1,
            kernel_size=[3] * 5, strides=[1, 2, 2, 2, 1],
            upsample_kernel_size=[1, 2, 2, 2, 1], dtype=jnp.bfloat16,
            s2d_threshold=thresh)
        params = net.init(jax.random.PRNGKey(0), x)["params"]
        g = jax.grad(
            lambda p: jnp.sum(net.apply({"params": p}, x) ** 2))(params)
        gmax = max(float(jnp.abs(v).max()) for v in jax.tree.leaves(g))
        assert np.isfinite(gmax) and gmax > 0


def test_resnet_generator_pth_import(rng, tmp_path):
    """Reference ResnetGenerator .pth (Sequential-index keys) maps fully into
    our flax generator; all mapped params differ from init, forward runs."""
    torch = pytest.importorskip("torch")
    from octa_tpu.io.checkpoints import import_resnet_generator_pth
    from octa_tpu.models.resnet_gan import resnetGenerator9

    def t(shape):
        return torch.tensor(rng.normal(0, 0.05, shape).astype(np.float32))

    sd = {"model.1.weight": t((64, 1, 7, 7)), "model.1.bias": t((64,))}
    sd["model.4.weight"] = t((128, 64, 3, 3)); sd["model.4.bias"] = t((128,))
    sd["model.8.weight"] = t((256, 128, 3, 3)); sd["model.8.bias"] = t((256,))
    for i in range(9):
        for j, tag in ((1, "conv1"), (5, "conv2")):
            sd[f"model.{12+i}.conv_block.{j}.weight"] = t((256, 256, 3, 3))
            sd[f"model.{12+i}.conv_block.{j}.bias"] = t((256,))
    sd["model.22.weight"] = t((128, 256, 3, 3)); sd["model.22.bias"] = t((128,))
    sd["model.26.weight"] = t((64, 128, 3, 3)); sd["model.26.bias"] = t((64,))
    sd["model.30.weight"] = t((1, 64, 7, 7)); sd["model.30.bias"] = t((1,))
    path = str(tmp_path / "gen.pth")
    torch.save({"model": sd, "epoch": 150}, path)

    net = resnetGenerator9()
    x = jnp.asarray(rng.random((1, 64, 64, 1)).astype(np.float32))
    init = net.init(jax.random.PRNGKey(0), x)["params"]
    params = import_resnet_generator_pth(path, init)
    # every conv kernel replaced (spot-check transpose correctness too)
    leaves0 = jax.tree.leaves(init)
    leaves1 = jax.tree.leaves(params)
    changed = sum(
        float(jnp.abs(a - b).max()) > 0 for a, b in zip(leaves0, leaves1))
    assert changed == len(leaves0)
    np.testing.assert_allclose(
        np.asarray(params["conv_in"]["kernel"]),
        sd["model.1.weight"].numpy().transpose(2, 3, 1, 0), atol=0)
    y = net.apply({"params": params}, x)
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())
