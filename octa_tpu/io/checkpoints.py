"""Checkpoint save/load with the reference's tag scheme.

Format: a single msgpack file (flax.serialization) holding
``{"epoch", "model", "optimizer", "config"}`` — mirroring the reference's
``torch.save`` dicts (``utils/visualizer.py:225-238``) with the tag naming
``{latest|best|<epoch>}_{netname}_model.ckpt`` / ``..._{optname}.ckpt``.

Also provides a torch ``.pth`` importer so reference-trained DynUNet /
ResnetGenerator checkpoints can be evaluated for parity
(``base_model_abc.py:93-109`` legacy S->segmentor, G->generator remap).
"""
from __future__ import annotations

import json
import os
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, payload: dict[str, Any]) -> str:
    """Save {"epoch", "model": params, "optimizer": opt_state, "config"}."""
    from flax import serialization

    os.makedirs(os.path.dirname(path), exist_ok=True)
    state = dict(payload)
    for k in ("model", "optimizer"):
        if state.get(k) is not None:
            state[k] = _to_numpy_tree(serialization.to_state_dict(state[k]))
    blob = serialization.msgpack_serialize(
        {"state": {k: v for k, v in state.items() if k != "config"},
         "config_json": json.dumps(state.get("config", {}), default=str)}
    )
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_checkpoint(path: str) -> dict[str, Any]:
    from flax import serialization

    with open(path, "rb") as f:
        obj = serialization.msgpack_restore(f.read())
    out = dict(obj["state"])
    out["config"] = json.loads(obj.get("config_json", "{}"))
    return out


def restore_like(template, loaded):
    """Restore a loaded state-dict into the structure/dtypes of ``template``
    (works for param dicts and optax namedtuple states)."""
    from flax import serialization

    restored = serialization.from_state_dict(template, loaded)
    return jax.tree.map(
        lambda t, l: jnp.asarray(l, dtype=getattr(t, "dtype", None)),
        template, restored)


# ---------------------------------------------------------------------------
# torch .pth import
# ---------------------------------------------------------------------------

def _torch_load(path: str) -> dict:
    import torch

    ck = torch.load(path, map_location="cpu", weights_only=False)
    sd = ck["model"] if isinstance(ck, dict) and "model" in ck else ck
    return {k: v.detach().numpy() for k, v in sd.items()}


def _conv_oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _convT_iohw_to_hwio(w: np.ndarray) -> np.ndarray:
    # torch ConvTranspose2d weight: (in, out, kH, kW); flax ConvTranspose
    # (transpose_kernel=False) additionally needs the kernel spatially
    # flipped: torch places x[i]*W[a] at output 2i+a, flax at 2i+(k-1-a).
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))


def import_dynunet_pth(path: str, flax_params: dict) -> dict:
    """Map a MONAI DynUNet state_dict into our flax DynUNet param tree."""
    sd = _torch_load(path)
    out = jax.tree.map(lambda x: x, flax_params)  # copy

    def put(block: dict, tname: str):
        """Fill a UnetBasicBlock {conv1, norm1, conv2, norm2}."""
        for i in (1, 2):
            block[f"conv{i}"]["kernel"] = jnp.asarray(
                _conv_oihw_to_hwio(sd[f"{tname}.conv{i}.conv.weight"]))
            block[f"norm{i}"]["scale"] = jnp.asarray(sd[f"{tname}.norm{i}.weight"])
            block[f"norm{i}"]["bias"] = jnp.asarray(sd[f"{tname}.norm{i}.bias"])

    put(out["input_block"], "input_block")
    i = 0
    while f"downsample_{i}" in out:
        put(out[f"downsample_{i}"], f"downsamples.{i}")
        i += 1
    put(out["bottleneck"], "bottleneck")
    j = 0
    while f"upsample_{j}" in out:
        up = out[f"upsample_{j}"]
        up["transp_conv"]["kernel"] = jnp.asarray(
            _convT_iohw_to_hwio(sd[f"upsamples.{j}.transp_conv.conv.weight"]))
        put(up["conv_block"], f"upsamples.{j}.conv_block")
        j += 1
    out["output_block"]["kernel"] = jnp.asarray(
        _conv_oihw_to_hwio(sd["output_block.conv.conv.weight"]))
    out["output_block"]["bias"] = jnp.asarray(sd["output_block.conv.conv.bias"])
    return out


def import_resnet_generator_pth(path: str, flax_params: dict) -> dict:
    """Map a reference ResnetGenerator state_dict (``networks.py:350-443``,
    Sequential indices of the 9-block antialiased generator) into our flax
    ResnetGenerator param tree. InstanceNorm is affine-free in the reference
    (no norm params); blur Up/Downsample filters are fixed binomial constants
    on both sides."""
    sd = _torch_load(path)
    out = jax.tree.map(lambda x: x, flax_params)

    def put(dst: dict, tkey: str):
        dst["kernel"] = jnp.asarray(_conv_oihw_to_hwio(sd[f"{tkey}.weight"]))
        if f"{tkey}.bias" in sd:
            dst["bias"] = jnp.asarray(sd[f"{tkey}.bias"])

    put(out["conv_in"], "model.1")
    put(out["down_conv_0"], "model.4")
    put(out["down_conv_1"], "model.8")
    i = 0
    while f"resblock_{i}" in out:
        put(out[f"resblock_{i}"]["conv1"], f"model.{12 + i}.conv_block.1")
        put(out[f"resblock_{i}"]["conv2"], f"model.{12 + i}.conv_block.5")
        i += 1
    put(out["up_conv_0"], f"model.{12 + i + 1}")
    put(out["up_conv_1"], f"model.{12 + i + 5}")
    put(out["conv_out"], f"model.{12 + i + 9}")
    return out


def load_network_for_inference(model_path, model_config: dict | None
                               ) -> Callable[[jax.Array], jax.Array]:
    """Build a frozen jitted ``apply(nhwc_batch) -> nhwc_batch`` from a
    checkpoint, for ImageToImageTranslationd and test-time inference."""
    from octa_tpu.models.registry import build_network

    if model_config is None:
        model_config = {"name": "resnetGenerator9"}
    net = build_network(dict(model_config))

    if isinstance(model_path, dict):
        # multi-network checkpoints: {"generator": path, ...}; use the first
        model_path = next(iter(model_path.values()))

    dummy = jnp.zeros((1, 64, 64, getattr(net, "input_nc", 1)))
    variables = net.init(jax.random.PRNGKey(0), dummy)

    if str(model_path).endswith(".pth"):
        from octa_tpu.models.dynunet import DynUNet
        from octa_tpu.models.resnet_gan import ResnetGenerator

        if isinstance(net, DynUNet):
            params = import_dynunet_pth(model_path, variables["params"])
        elif isinstance(net, ResnetGenerator):
            params = import_resnet_generator_pth(
                model_path, variables["params"])
        else:
            raise NotImplementedError(
                f".pth import for {type(net).__name__} not yet supported")
    else:
        ck = load_checkpoint(str(model_path))
        params = restore_like(variables["params"], ck["model"])
        print(f"Loaded network weights from epoch {ck.get('epoch')}.")

    @jax.jit
    def apply_fn(x):
        return net.apply({"params": params}, x)

    return apply_fn
