"""Training algorithms as pure jitted step functions.

Each algorithm mirrors one of the reference's model classes
(``models/lambda_model.py``, ``models/gan_seg_model.py``, ...) but is
expressed TPU-first: networks are Flax modules, parameters/optimizer states
are explicit pytrees, and ``perform_training_step`` is a single jitted
function ``(state, batch, rng) -> (state, outputs, losses)`` with the batch
sharded over the mesh's ``data`` axis and parameters replicated (XLA inserts
the gradient psums — the pjit equivalent of DDP, which the reference lacks).

Interface kept reference-shaped (initialize_model_and_optimizer /
perform_training_step / inference / compute_metric / plot_sample /
checkpoint hooks) so the engine loop, visualizer artifacts and the
checkpoint tag scheme line up with the original train.py.
"""
from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from octa_tpu.models.registry import ALGORITHM_NAMES, NETWORK_DICT
from octa_tpu.parallel import mesh as mesh_lib
from octa_tpu.train.state import (
    linear_decay_factor,
    make_optimizer,
    set_learning_rate,
)
from octa_tpu.utils import losses as losses_lib
from octa_tpu.utils.enums import Phase


def _nchw_to_nhwc(x):
    return jnp.asarray(x, jnp.float32).transpose(0, 2, 3, 1)


def _nhwc_to_nchw(x):
    return x.transpose(0, 3, 1, 2)


class BaseAlgorithm:
    """Multi-network, multi-optimizer training procedure."""

    #: {optimizer_name: [net_names]} — mirrors the reference optimizer_mapping
    optimizer_mapping: dict[str, list[str]] = {}
    optimizer_configs: dict[str, dict] = {}

    def __init__(self, config: dict, phase: Phase):
        self.config = config
        self.phase = phase
        self.networks: dict[str, Any] = {}
        self.params: dict[str, Any] = {}
        self.mutables: dict[str, Any] = {}
        self.opt: dict[str, Any] = {}
        self.opt_state: dict[str, Any] = {}
        self.base_lr: dict[str, float] = {}
        self.rngs = jax.random.PRNGKey(config["General"].get("seed", 42))
        self._step_count = 0
        amp = bool(config["General"].get("amp"))
        self.dtype = jnp.bfloat16 if amp else jnp.float32
        self.mesh = None

    # -- rng helper -------------------------------------------------------
    def next_rng(self):
        self._step_count += 1
        return jax.random.fold_in(self.rngs, self._step_count)

    # -- optimizer setup --------------------------------------------------
    def _init_optimizers(self, config):
        train_cfg = config[Phase.TRAIN]
        for opt_name, net_names in self.optimizer_mapping.items():
            cfg = dict(lr=train_cfg["lr"], betas=(0.5, 0.999),
                       weight_decay=train_cfg.get("weight_decay", 0) or 0)
            cfg.update(self.optimizer_configs.get(opt_name, {}))
            tx = make_optimizer(cfg["lr"], cfg["betas"], cfg["weight_decay"])
            params = {n: self.params[n] for n in net_names}
            self.opt[opt_name] = tx
            self.opt_state[opt_name] = tx.init(params)
            self.base_lr[opt_name] = cfg["lr"]
        self._setup_mesh(train_cfg.get("batch_size") or 1)

    # -- multi-chip data parallelism ---------------------------------------
    def _setup_mesh(self, batch_size: int):
        """DP over all visible devices: batch sharded on a ``data`` axis,
        parameters/optimizer state replicated; XLA inserts the gradient
        psums inside the jitted steps (SURVEY §2.9/§5.8)."""
        if len(jax.devices()) <= 1 or batch_size <= 1:
            return
        mesh = mesh_lib.get_mesh(batch_size=batch_size)
        if mesh.size <= 1:
            return
        self.mesh = mesh
        rep = mesh_lib.replicated(mesh)
        self.params = jax.device_put(self.params, rep)
        self.opt_state = jax.device_put(self.opt_state, rep)
        self.mutables = jax.device_put(self.mutables, rep)

    def shard_array(self, x):
        """Device-put a batch array sharded over the data axis (replicates
        transparently when the batch doesn't divide the mesh)."""
        x = jnp.asarray(x)
        if self.mesh is None or x.ndim == 0 \
                or x.shape[0] % self.mesh.size != 0:
            return x
        return jax.device_put(x, mesh_lib.batch_sharding(self.mesh))

    def _batch_in(self, arr):
        """NCHW host batch -> NHWC device array, sharded over the mesh."""
        return self.shard_array(_nchw_to_nhwc(np.asarray(arr)))

    def scheduler_step(self, epoch: int):
        """Linear decay over the last epochs_decay epochs (per epoch)."""
        train_cfg = self.config[Phase.TRAIN]
        factor = linear_decay_factor(
            epoch + 1, train_cfg["epochs"], train_cfg.get("epochs_decay", 0))
        for opt_name in self.opt:
            self.opt_state[opt_name] = set_learning_rate(
                self.opt_state[opt_name], self.base_lr[opt_name] * factor)

    # -- checkpoints ------------------------------------------------------
    def network_state(self, name: str) -> dict:
        return {"params": self.params[name],
                "mutables": self.mutables.get(name)}

    def load_network_state(self, name: str, state: dict):
        from octa_tpu.io.checkpoints import restore_like

        self.params[name] = restore_like(self.params[name], state["params"])
        if state.get("mutables") and self.mutables.get(name):
            self.mutables[name] = restore_like(
                self.mutables[name], state["mutables"])

    def optimizer_state(self, opt_name: str):
        return self.opt_state[opt_name]

    def load_optimizer_state(self, opt_name: str, state):
        from octa_tpu.io.checkpoints import restore_like

        self.opt_state[opt_name] = restore_like(
            self.opt_state[opt_name], state)

    # -- reference interface ----------------------------------------------
    def train(self):
        pass

    def eval(self):
        pass

    def compute_metric(self, outputs, metrics) -> None:
        metrics(outputs["prediction"], outputs["label"])

    def plot_sample(self, visualizer, mini_batch, outputs, *, suffix=""):
        key = "image" if "image" in mini_batch else "real_A"
        return visualizer.plot_sample(
            np.asarray(mini_batch[key][0]),
            np.asarray(outputs["prediction"][0]),
            np.asarray(outputs["label"][0]) if "label" in outputs else None,
            suffix=suffix,
        )

    def num_parameters(self) -> dict[str, int]:
        return {
            n: sum(int(np.prod(x.shape)) for x in jax.tree.leaves(p))
            for n, p in self.params.items()
        }


def _post_first(post, arr_nchw):
    """Apply a post-processing Compose to the first batch element
    (reference decollate_batch(pred[0:1]) pattern)."""
    first = np.asarray(arr_nchw[0:1])[0]
    return [post(first)] if post is not None else [first]


class SegAlgorithm(BaseAlgorithm):
    """Single-network segmentation/translation training — the reference's
    ``LambdaModel`` (``models/lambda_model.py``) incl. optional adversarial
    noise training (AT)."""

    optimizer_mapping = {"optimizer": ["model"]}

    def __init__(self, model_name: str, config: dict, phase: Phase, **net_kwargs):
        super().__init__(config, phase)
        self.model_name = model_name
        ctor = NETWORK_DICT[model_name]
        net_kwargs.pop("phase", None)
        net_kwargs.pop("MODEL_DICT", None)
        net_kwargs.pop("inference", None)
        if model_name in ("DynUNet", "resnetGenerator9", "patchGAN70x70",
                          "ResnetGenerator", "NLayerDiscriminator"):
            if phase == Phase.TRAIN and model_name == "DynUNet":
                # gradient-checkpoint the blocks by default: the reference
                # recipe (batch 4, 1216²) needs ~22GB HBM un-remat'd and
                # OOMs a 16GB v5e; with remat it fits (config can override
                # with an explicit "remat": false)
                net_kwargs.setdefault("remat", True)
            self.net = ctor(dtype=self.dtype, **net_kwargs)
            self.parameterless = False
        else:
            self.net = ctor(**net_kwargs)  # frangi / oof / skrgan callables
            self.parameterless = not hasattr(self.net, "init")

    # ------------------------------------------------------------------
    def initialize_model_and_optimizer(self, init_mini_batch, config, args,
                                       phase: Phase = Phase.TRAIN):
        self.loss_name = config.get(Phase.TRAIN, {}).get("loss", "")
        self.loss_function = losses_lib.get_loss_function_by_name(
            self.loss_name, config)
        self.at = None
        if phase == Phase.TRAIN and config[Phase.TRAIN].get("AT", False):
            self.at = losses_lib.get_loss_function_by_name(
                "AtLoss", config, None, self.loss_function)

        if self.parameterless:
            print(f"Skipping initialization for {self.model_name}")
            return

        img = np.asarray(init_mini_batch["image"])
        x = jnp.zeros((1, img.shape[2], img.shape[3], img.shape[1]))
        variables = self.net.init(jax.random.PRNGKey(
            config["General"].get("seed", 42)), x)
        self.params["model"] = variables["params"]
        self.mutables["model"] = {
            k: v for k, v in variables.items() if k != "params"}

        if phase == Phase.TRAIN:
            self._init_optimizers(config)
            if getattr(args, "start_epoch", 0) > 0:
                self._load_resume_checkpoints(config, args)
        else:
            self._load_inference_checkpoint(config, args)
        self._build_steps()

    def _load_resume_checkpoints(self, config, args):
        import os

        from octa_tpu.io.checkpoints import load_checkpoint

        ckdir = os.path.join(config["Output"]["save_dir"], "checkpoints")
        tag = getattr(args, "epoch", "latest")
        ck = load_checkpoint(os.path.join(ckdir, f"{tag}_model_model.ckpt"))
        self.load_network_state("model", {"params": ck["model"]})
        opt_path = os.path.join(ckdir, f"{tag}_optimizer.ckpt")
        if os.path.exists(opt_path):
            self.load_optimizer_state(
                "optimizer", load_checkpoint(opt_path)["optimizer"])
        print(f"Loaded all network weights from epoch {ck.get('epoch')}.")

    def _load_inference_checkpoint(self, config, args):
        import os

        from octa_tpu.io.checkpoints import load_checkpoint

        model_path = config.get(Phase.TEST, {}).get("model_path")
        if not model_path:
            ckdir = os.path.join(config["Output"]["save_dir"], "checkpoints")
            tag = getattr(args, "epoch", "latest") or "latest"
            model_path = os.path.join(ckdir, f"{tag}_model_model.ckpt")
        if str(model_path).endswith(".pth"):
            from octa_tpu.io.checkpoints import import_dynunet_pth

            self.params["model"] = import_dynunet_pth(
                model_path, self.params["model"])
        else:
            ck = load_checkpoint(model_path)
            self.load_network_state("model", {"params": ck["model"]})
            print(f"Loaded network weights from epoch {ck.get('epoch')}.")

    # ------------------------------------------------------------------
    def _build_steps(self):
        net, tx = self.net, self.opt.get("optimizer")
        loss_fn = self.loss_function

        def apply_net(params, x):
            return net.apply({"params": params, **self.mutables["model"]}, x)

        @jax.jit
        def train_step(params, opt_state, x, y):
            def loss_of(p):
                pred = apply_net(p, x)
                loss = loss_fn(pred, y)
                return loss, pred

            (loss, pred), grads = jax.value_and_grad(
                loss_of, has_aux=True)(params)
            updates, opt_state = tx.update(
                {"model": grads}, opt_state, {"model": params})
            params = optax.apply_updates({"model": params}, updates)["model"]
            return params, opt_state, pred, loss

        @jax.jit
        def eval_step(params, x, y):
            pred = apply_net(params, x)
            return pred, loss_fn(pred, y)

        @jax.jit
        def infer_step(params, x):
            return apply_net(params, x)

        @functools.partial(jax.jit, static_argnames=())
        def at_step(params, x_raw, background, y, rng):
            adv, y_crop = self.at(
                lambda img: apply_net(params, img),
                x_raw, background, y, rng)
            return adv, y_crop

        self._train_step = train_step
        self._eval_step = eval_step
        self._infer_step = infer_step
        self._at_step = at_step if self.at is not None else None

    # ------------------------------------------------------------------
    def perform_training_step(self, mini_batch, post_transformations):
        x = self._batch_in(mini_batch["image"])
        y = self._batch_in(mini_batch["label"])
        if self.at is not None:
            bg = self.shard_array(np.asarray(mini_batch["background"])[:, 0])
            adv, y_crop = self._at_step(
                self.params["model"], x[..., 0], bg, y[..., 0], self.next_rng())
            x, y = adv[..., None], y_crop[..., None]
            mini_batch["image"] = np.asarray(_nhwc_to_nchw(x))
        self.params["model"], self.opt_state["optimizer"], pred, loss = (
            self._train_step(self.params["model"],
                             self.opt_state["optimizer"], x, y))
        pred_nchw = _nhwc_to_nchw(pred)
        outputs = {
            "prediction": _post_first(
                post_transformations.get("prediction"), pred_nchw),
            "label": _post_first(
                post_transformations.get("label"), _nhwc_to_nchw(y)),
        }
        return outputs, {self.loss_name: float(loss)}

    def inference(self, mini_batch, post_transformations,
                  phase: Phase = Phase.TEST):
        x = self._batch_in(mini_batch["image"])
        if self.parameterless:
            pred_nchw = np.asarray(self.net(np.asarray(mini_batch["image"])))
            losses = {}
            if phase != Phase.TEST:
                y_nchw = np.asarray(mini_batch["label"])
                losses = {self.loss_name or "loss": float(0.0)}
        elif phase != Phase.TEST:
            y = self._batch_in(mini_batch["label"])
            pred, loss = self._eval_step(self.params["model"], x, y)
            pred_nchw = _nhwc_to_nchw(pred)
            losses = {self.loss_name: loss}
        else:
            pred = self._infer_step(self.params["model"], x)
            pred_nchw = _nhwc_to_nchw(pred)
            losses = None
        outputs = {"prediction": _post_first(
            post_transformations.get("prediction"), pred_nchw)}
        if phase != Phase.TEST:
            outputs["label"] = _post_first(
                post_transformations.get("label"),
                np.asarray(mini_batch["label"]))
        return outputs, losses

    def forward(self, x_nhwc):
        if self.parameterless:
            return self.net(x_nhwc)
        return self.net.apply(
            {"params": self.params["model"], **self.mutables["model"]}, x_nhwc)


class GanSegAlgorithm(BaseAlgorithm):
    """Joint GAN + segmentation training — the reference's S-GAN
    (``models/gan_seg_model.py``): generator 304²->realistic OCTA,
    70x70 PatchGAN discriminator, DynUNet segmentor at ``upshape``.

    One jitted step performs the D update followed by the joint G+S update
    exactly as the reference's two scaler phases (D updated before the G+S
    discriminator forward)."""

    optimizer_mapping = {
        "optimizer_G": ["generator"],
        "optimizer_D": ["discriminator"],
        "optimizer_S": ["segmentor"],
    }
    optimizer_configs = {"optimizer_S": {"betas": (0.9, 0.999)}}

    def __init__(self, config: dict, phase: Phase, model_g: dict,
                 model_d: dict, model_s: dict, compute_identity=True,
                 compute_identity_seg=True, inference=None,
                 upshape=(1216, 1216), **kwargs):
        super().__init__(config, phase)
        from octa_tpu.models.registry import build_network

        self.inference_mode = inference or config["General"].get("inference")
        self.compute_identity = compute_identity
        self.compute_identity_seg = compute_identity_seg
        self.upshape = tuple(upshape)
        if phase == Phase.TRAIN or self.inference_mode == "S":
            s_cfg = dict(model_s)
            if phase == Phase.TRAIN and s_cfg.get("name") == "DynUNet":
                # gradient-checkpoint the 1216² segmentor inside the joint
                # step: the 3 segmentor passes otherwise need ~26GB HBM
                s_cfg.setdefault("remat", True)
            self.networks["segmentor"] = build_network(
                s_cfg, dtype=self.dtype)
        if phase == Phase.TRAIN or self.inference_mode == "G":
            self.networks["generator"] = build_network(
                dict(model_g), dtype=self.dtype)
        if phase == Phase.TRAIN:
            self.networks["discriminator"] = build_network(
                dict(model_d), dtype=self.dtype)

    # ------------------------------------------------------------------
    def initialize_model_and_optimizer(self, init_mini_batch, config, args,
                                       phase: Phase = Phase.TRAIN):
        if phase != Phase.TEST:
            self.loss_name_dg = config[Phase.TRAIN]["loss_dg"]
            self.loss_name_s = config[Phase.TRAIN]["loss_s"]
            self.dg_loss = losses_lib.get_loss_function_by_name(
                self.loss_name_dg, config)
            self.s_loss = losses_lib.get_loss_function_by_name(
                self.loss_name_s, config)

        seed = config["General"].get("seed", 42)
        shapes = {}
        if "real_A" in init_mini_batch:
            a = np.asarray(init_mini_batch["real_A"])
            shapes["generator"] = (1, a.shape[2], a.shape[3], a.shape[1])
            shapes["discriminator"] = shapes["generator"]
        elif "image" in init_mini_batch:
            im = np.asarray(init_mini_batch["image"])
            shapes["generator"] = (1, im.shape[2], im.shape[3], im.shape[1])
            shapes["discriminator"] = shapes["generator"]
        shapes["segmentor"] = (1, *self.upshape, 1)

        for i, (name, net) in enumerate(self.networks.items()):
            variables = net.init(jax.random.PRNGKey(seed + i),
                                 jnp.zeros(shapes[name]))
            self.params[name] = variables["params"]
            self.mutables[name] = {
                k: v for k, v in variables.items() if k != "params"}

        if phase == Phase.TRAIN:
            self._init_optimizers(config)
            if getattr(args, "start_epoch", 0) > 0:
                self._load_resume_checkpoints(config, args)
        else:
            self._load_inference_checkpoint(config, args)
        self._build_steps()

    def _load_resume_checkpoints(self, config, args):
        import os

        from octa_tpu.io.checkpoints import load_checkpoint

        ckdir = os.path.join(config["Output"]["save_dir"], "checkpoints")
        tag = getattr(args, "epoch", "latest")
        for opt_name, net_names in self.optimizer_mapping.items():
            for net_name in net_names:
                ck = load_checkpoint(
                    os.path.join(ckdir, f"{tag}_{net_name}_model.ckpt"))
                self.load_network_state(net_name, {"params": ck["model"]})
            opt_path = os.path.join(ckdir, f"{tag}_{opt_name}.ckpt")
            if os.path.exists(opt_path):
                self.load_optimizer_state(
                    opt_name, load_checkpoint(opt_path)["optimizer"])

    def _load_inference_checkpoint(self, config, args):
        import os

        from octa_tpu.io.checkpoints import load_checkpoint

        mode = self.inference_mode
        net_name = {"S": "segmentor", "G": "generator"}.get(mode, mode)
        model_path = (config.get(Phase.TEST, {}) or {}).get("model_path")
        if not model_path:
            ckdir = os.path.join(config["Output"]["save_dir"], "checkpoints")
            tag = getattr(args, "epoch", "latest") or "latest"
            model_path = os.path.join(ckdir, f"{tag}_{net_name}_model.ckpt")
        ck = load_checkpoint(str(model_path))
        self.load_network_state(net_name, {"params": ck["model"]})
        print(f"Loaded network weights {net_name} from epoch {ck.get('epoch')}.")

    # ------------------------------------------------------------------
    def _apply(self, name, params, x, **kw):
        return self.networks[name].apply(
            {"params": params, **self.mutables[name]}, x, **kw)

    def _segment(self, params, img):
        up = jax.image.resize(
            img, (img.shape[0], *self.upshape, img.shape[-1]), "linear")
        return self._apply("segmentor", params, up)

    def _build_steps(self):
        if self.phase != Phase.TRAIN:
            # inference (test.py/validate.py): no losses or optimizers exist;
            # only the eval steps are needed (reference gan_seg_model.py
            # inference dispatches by General.inference without them)
            self._train_step = None
            self._seg_eval = jax.jit(
                lambda ps, image: self._segment(ps, image))
            self._gen_eval = jax.jit(
                lambda pg, image: self._apply("generator", pg, image))
            return
        dg_loss, s_loss = self.dg_loss, self.s_loss
        tx_g, tx_d, tx_s = (self.opt["optimizer_G"], self.opt["optimizer_D"],
                            self.opt["optimizer_S"])
        l1 = losses_lib.L1Loss()

        @jax.jit
        def train_step(params, opt_state, real_A, real_B, real_A_seg):
            pg, pd, ps = (params["generator"], params["discriminator"],
                          params["segmentor"])

            fake_B = self._apply("generator", pg, real_A)
            if self.compute_identity or self.compute_identity_seg:
                idt_B = self._apply("generator", pg, real_B)
            else:
                idt_B = None

            # --- D update (on detached fake_B) ---
            def d_loss_fn(pd_):
                pred_fake = self._apply(
                    "discriminator", pd_, jax.lax.stop_gradient(fake_B))
                pred_real = self._apply("discriminator", pd_, real_B)
                loss_fake = dg_loss(pred_fake, False)
                loss_real = dg_loss(pred_real, True)
                return 0.5 * (loss_fake + loss_real), (loss_fake, loss_real)

            (loss_D, (loss_D_fake, loss_D_real)), gd = jax.value_and_grad(
                d_loss_fn, has_aux=True)(pd)
            upd, od = tx_d.update({"discriminator": gd},
                                  opt_state["optimizer_D"],
                                  {"discriminator": pd})
            pd = optax.apply_updates({"discriminator": pd}, upd)["discriminator"]

            # --- joint G+S update (D frozen at its *updated* params) ---
            def gs_loss_fn(pg_, ps_):
                fake_B_ = self._apply("generator", pg_, real_A)
                idt_B_ = (self._apply("generator", pg_, real_B)
                          if idt_B is not None else None)
                pred_fake = self._apply("discriminator", pd, fake_B_)
                real_B_seg = jax.lax.stop_gradient(
                    (self._segment(ps_, real_B) > 0.5).astype(jnp.float32))
                fake_B_seg = self._segment(ps_, fake_B_)
                loss_G = dg_loss(pred_fake, True)
                loss_G_idt = (l1(idt_B_, real_B) if self.compute_identity
                              else jnp.float32(0))
                loss_G = loss_G + loss_G_idt
                loss_S = s_loss(fake_B_seg, real_A_seg)
                if self.compute_identity_seg:
                    idt_B_seg = self._segment(ps_, idt_B_)
                    loss_S_idt = s_loss(idt_B_seg, real_B_seg)
                    loss_SS = 0.5 * (loss_S + loss_S_idt)
                else:
                    loss_S_idt = jnp.float32(0)
                    loss_SS = loss_S
                total = loss_G + loss_SS
                aux = (fake_B_, idt_B_ if idt_B_ is not None else fake_B_,
                       fake_B_seg, real_B_seg, loss_G, loss_G_idt, loss_S,
                       loss_S_idt)
                return total, aux

            (loss_GS, aux), (gg, gs) = jax.value_and_grad(
                gs_loss_fn, argnums=(0, 1), has_aux=True)(pg, ps)
            (fake_B_o, idt_B_o, fake_B_seg, real_B_seg,
             loss_G, loss_G_idt, loss_S, loss_S_idt) = aux

            upd, og = tx_g.update({"generator": gg}, opt_state["optimizer_G"],
                                  {"generator": pg})
            pg = optax.apply_updates({"generator": pg}, upd)["generator"]
            upd, os_ = tx_s.update({"segmentor": gs}, opt_state["optimizer_S"],
                                   {"segmentor": ps})
            ps = optax.apply_updates({"segmentor": ps}, upd)["segmentor"]

            new_params = {"generator": pg, "discriminator": pd, "segmentor": ps}
            new_opt = {"optimizer_G": og, "optimizer_D": od, "optimizer_S": os_}
            losses = {
                "S": loss_S, "D_fake": loss_D_fake, "D_real": loss_D_real,
                "G": loss_G, "G_idt": loss_G_idt, "S_idt": loss_S_idt,
            }
            outs = (fake_B_o, idt_B_o, fake_B_seg, real_B_seg)
            return new_params, new_opt, outs, losses

        @jax.jit
        def seg_eval_step(ps, image):
            return self._segment(ps, image)

        @jax.jit
        def gen_eval_step(pg, image):
            return self._apply("generator", pg, image)

        self._train_step = train_step
        self._seg_eval = seg_eval_step
        self._gen_eval = gen_eval_step

    # ------------------------------------------------------------------
    def perform_training_step(self, mini_batch, post_transformations):
        real_A = self._batch_in(mini_batch["real_A"])
        real_B = self._batch_in(mini_batch["real_B"])
        real_A_seg = self._batch_in(mini_batch["real_A_seg"])
        self.params, self.opt_state, outs, losses = self._train_step(
            self.params, self.opt_state, real_A, real_B, real_A_seg)
        fake_B, idt_B, fake_B_seg, real_B_seg = outs
        outputs = {
            "prediction": _post_first(post_transformations.get("prediction"),
                                      _nhwc_to_nchw(fake_B_seg)),
            "label": _post_first(post_transformations.get("label"),
                                 _nhwc_to_nchw(real_A_seg)),
            "fake_B": np.asarray(_nhwc_to_nchw(fake_B)[0:1, 0:1]),
            "idt_B": np.asarray(_nhwc_to_nchw(idt_B)[0:1, 0:1]),
            "real_B_seg": np.asarray(_nhwc_to_nchw(real_B_seg)),
        }
        return outputs, {k: float(v) for k, v in losses.items()}

    def inference(self, mini_batch, post_transformations,
                  phase: Phase = Phase.TEST):
        x = self._batch_in(mini_batch["image"])
        losses = {}
        if "segmentor" in self.params:
            pred = self._seg_eval(self.params["segmentor"], x)
            if phase == Phase.VALIDATION and "label" in mini_batch:
                y = self._batch_in(mini_batch["label"])
                losses[self.loss_name_s] = self.s_loss(pred, y)
        else:
            pred = self._gen_eval(self.params["generator"], x)
        pred_nchw = _nhwc_to_nchw(pred)
        outputs = {"prediction": _post_first(
            post_transformations.get("prediction"), pred_nchw)}
        if "segmentor" in self.params and phase == Phase.VALIDATION \
                and "label" in mini_batch:
            outputs["label"] = _post_first(
                post_transformations.get("label"),
                np.asarray(mini_batch["label"]))
        return outputs, losses

    def plot_sample(self, visualizer, mini_batch, outputs, *, suffix=""):
        if "fake_B" in outputs:
            return visualizer.plot_gan_seg_sample(
                np.asarray(mini_batch["real_A"][0]),
                outputs["fake_B"][0],
                np.asarray(outputs["prediction"][0]),
                np.asarray(mini_batch["real_B"][0]),
                outputs["idt_B"][0],
                outputs["real_B_seg"][0],
                path_a=mini_batch.get("real_A_path", [""])[0],
                path_b=mini_batch.get("real_B_path", [""])[0],
                suffix=suffix,
            )
        return super().plot_sample(visualizer, mini_batch, outputs,
                                   suffix=suffix)


def define_model(config: dict, phase: Phase):
    """Dispatch ``General.model.name`` (reference ``models/model.py:7-18``)."""
    model_params = dict(config["General"]["model"])
    name = model_params.pop("name")
    if name == "GanSegModel":
        return GanSegAlgorithm(config=config, phase=phase, **model_params)
    if name in ALGORITHM_NAMES:
        from octa_tpu.train import gan_algorithms

        return gan_algorithms.build(name, config, phase, **model_params)
    return SegAlgorithm(model_name=name, config=config, phase=phase,
                        **model_params)
