"""Unpaired image-translation algorithms as jitted JAX training steps:
CycleGAN (``models/cycle_gan.py``), CUT (``models/cut.py``), NEGCUT
(``models/negcut.py``), DCLGAN (``models/dclgan.py``), NICE-GAN
(``models/nice_gan.py``).

Shared TPU-first conventions with ``octa_tpu.train.algorithms``: parameters
are explicit pytrees, discriminator freezing is expressed by differentiating
only w.r.t. the generator params (grad args), ``detach`` is
``jax.lax.stop_gradient``, and the ImagePool discriminator replay buffer is
host-side state between the (separately jitted) G and D phases — mirroring
the reference's two scaler phases.
"""
from __future__ import annotations

import random as pyrandom
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from octa_tpu.models.registry import build_network
from octa_tpu.train.algorithms import (
    BaseAlgorithm,
    _nchw_to_nhwc,
    _nhwc_to_nchw,
    _post_first,
)
from octa_tpu.utils import losses as losses_lib
from octa_tpu.utils.enums import Phase

_BUILDERS: dict[str, type] = {}


def register(name):
    def deco(cls):
        _BUILDERS[name] = cls
        return cls

    return deco


def build(name: str, config: dict, phase: Phase, **model_params):
    if name not in _BUILDERS:
        raise NotImplementedError(
            f"Algorithm {name} is not implemented. Available: "
            f"{sorted(_BUILDERS)}")
    return _BUILDERS[name](config=config, phase=phase, **model_params)


class ImagePool:
    """50%-replay discriminator buffer (reference ``cycle_gan.py:287-336``).
    Host-side stateful numpy; returns the mixed batch."""

    def __init__(self, pool_size: int, seed: int = 0):
        self.pool_size = pool_size
        self.images: list[np.ndarray] = []
        self.rng = pyrandom.Random(seed)

    def query(self, images: np.ndarray) -> np.ndarray:
        if self.pool_size == 0:
            return images
        out = []
        for image in np.asarray(images):
            image = image[None]
            if len(self.images) < self.pool_size:
                self.images.append(image)
                out.append(image)
            elif self.rng.uniform(0, 1) > 0.5:
                rid = self.rng.randint(0, self.pool_size - 1)
                out.append(self.images[rid].copy())
                self.images[rid] = image
            else:
                out.append(image)
        return np.concatenate(out, 0)


class _UnpairedBase(BaseAlgorithm):
    """Shared: network init from configs, inference dispatch by net name."""

    def _init_networks(self, phase, shapes: dict[str, tuple], seed: int):
        for i, (name, net) in enumerate(self.networks.items()):
            x = jnp.zeros(shapes[name])
            variables = net.init(jax.random.PRNGKey(seed + i), x)
            self.params[name] = variables["params"]
            self.mutables[name] = {
                k: v for k, v in variables.items() if k != "params"}

    def _apply(self, name, params, x, *args, mutables=None, **kw):
        variables = {"params": params,
                     **(mutables if mutables is not None
                        else self.mutables.get(name, {}))}
        return self.networks[name].apply(variables, x, *args, **kw)

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
            p = os.path.join(ckdir, f"{tag}_{opt_name}.ckpt")
            if os.path.exists(p):
                self.load_optimizer_state(
                    opt_name, load_checkpoint(p)["optimizer"])

    def _load_inference_checkpoint(self, config, args):
        import os

        from octa_tpu.io.checkpoints import load_checkpoint

        net_name = self.inference_mode
        model_path = (config.get(Phase.TEST, {}) or {}).get("model_path")
        if not model_path:
            ckdir = os.path.join(config["Output"]["save_dir"], "checkpoints")
            tag = getattr(args, "epoch", "latest") or "latest"
            model_path = os.path.join(ckdir, f"{tag}_{net_name}_model.ckpt")
        ck = load_checkpoint(str(model_path))
        self.load_network_state(net_name, {"params": ck["model"]})
        print(f"Loaded network weights {net_name} from epoch "
              f"{ck.get('epoch')}.")

    def _gen_inference(self, net_name, mini_batch, post_transformations,
                       phase, cycle_loss=None, cycle_loss_name="L1_cycle"):
        x = self._batch_in(mini_batch["image"])
        pred = self._infer(net_name, x)
        outputs = {"prediction": _post_first(
            post_transformations.get("prediction"), _nhwc_to_nchw(pred))}
        losses: dict[str, Any] = {}
        if phase == Phase.VALIDATION and "label" in mini_batch \
                and cycle_loss is not None:
            y = self._batch_in(mini_batch["label"])
            outputs["label"] = _post_first(
                post_transformations.get("label"),
                np.asarray(mini_batch["label"]))
            losses[cycle_loss_name] = cycle_loss(pred, y)
        return outputs, losses

    def _infer(self, net_name, x):
        return self._apply(net_name, self.params[net_name], x)

    def plot_sample(self, visualizer, mini_batch, outputs, *, suffix=""):
        if "fake_B" in outputs:
            return visualizer.plot_gan_seg_sample(
                np.asarray(mini_batch["real_A"][0]),
                outputs["fake_B"][0],
                np.asarray(outputs["prediction"][0]),
                np.asarray(mini_batch["real_B"][0]),
                outputs.get("idt_A", outputs.get("idt_B"))[0],
                outputs["real_B_seg"][0],
                suffix=suffix)
        if "idt_B" in outputs:
            return visualizer.plot_cut_sample(
                np.asarray(mini_batch["real_A"][0]),
                np.asarray(outputs["prediction"][0]),
                np.asarray(mini_batch["real_B"][0]),
                outputs["idt_B"][0], suffix=suffix)
        return super().plot_sample(visualizer, mini_batch, outputs,
                                   suffix=suffix)


@register("CycleGAN")
class CycleGANAlgorithm(_UnpairedBase):
    """Two-generator/two-discriminator cycle-consistency training
    (``cycle_gan.py:146-248``): G step first (GAN + cycle + identity with the
    background-noise compositing max(real_A, bg*U)), then D step on
    ImagePool-replayed fakes."""

    optimizer_mapping = {"optimizer_G": ["netG_A", "netG_B"],
                         "optimizer_D": ["netD_A", "netD_B"]}

    def __init__(self, config, phase, netG_A_config, netG_B_config,
                 netD_A_config=None, netD_B_config=None, lambda_A=10.0,
                 lambda_B=10.0, lambda_idt=0.5, pool_size=50,
                 inference=None, **kw):
        super().__init__(config, phase)
        self.inference_mode = inference or config["General"].get("inference")
        self.lambda_A, self.lambda_B = lambda_A, lambda_B
        self.lambda_idt = lambda_idt
        if phase == Phase.TRAIN or self.inference_mode == "netG_A":
            self.networks["netG_A"] = build_network(dict(netG_A_config),
                                                    dtype=self.dtype)
        if phase == Phase.TRAIN or self.inference_mode == "netG_B":
            self.networks["netG_B"] = build_network(dict(netG_B_config),
                                                    dtype=self.dtype)
        if phase == Phase.TRAIN:
            self.networks["netD_A"] = build_network(dict(netD_A_config),
                                                    dtype=self.dtype)
            self.networks["netD_B"] = build_network(dict(netD_B_config),
                                                    dtype=self.dtype)
            seed = config["General"].get("seed", 42)
            self.fake_A_pool = ImagePool(pool_size, seed)
            self.fake_B_pool = ImagePool(pool_size, seed + 1)

    def initialize_model_and_optimizer(self, init_mini_batch, config, args,
                                       phase=Phase.TRAIN):
        if phase != Phase.TEST:
            tr = config[Phase.TRAIN]
            self.criterionGAN = losses_lib.get_loss_function_by_name(
                tr["loss_criterionGAN"], config)
            self.criterionCycle = losses_lib.get_loss_function_by_name(
                tr["loss_criterionCycle"], config)
            self.criterionIdt = losses_lib.get_loss_function_by_name(
                tr["loss_criterionIdt"], config)
        key = "real_A" if "real_A" in init_mini_batch else "image"
        a = np.asarray(init_mini_batch[key])
        shape = (1, a.shape[2], a.shape[3], a.shape[1])
        self._init_networks(phase, {n: shape for n in self.networks},
                            config["General"].get("seed", 42))
        if phase == Phase.TRAIN:
            self._init_optimizers(config)
            if getattr(args, "start_epoch", 0) > 0:
                self._load_resume_checkpoints(config, args)
            self._build_steps()
        else:
            self._load_inference_checkpoint(config, args)

    def _build_steps(self):
        gan, cyc, idt = self.criterionGAN, self.criterionCycle, self.criterionIdt
        lA, lB, lidt = self.lambda_A, self.lambda_B, self.lambda_idt
        tx_g, tx_d = self.opt["optimizer_G"], self.opt["optimizer_D"]

        @jax.jit
        def g_step(params, opt_g, real_A, real_B, background, u):
            bg = background * u

            def loss_fn(pg):
                ga, gb = pg["netG_A"], pg["netG_B"]
                fake_B = self._apply("netG_A", ga, jnp.maximum(real_A, bg))
                rec_A = self._apply("netG_B", gb, fake_B)
                fake_A = self._apply("netG_B", gb, real_B)
                rec_B = self._apply("netG_A", ga, jnp.maximum(fake_A, bg))
                if lidt > 0:
                    idt_A = self._apply("netG_A", ga, real_B)
                    loss_idt_A = idt(idt_A, real_B) * lB * lidt
                    idt_B = self._apply("netG_B", gb, real_A)
                    loss_idt_B = idt(idt_B, real_A) * lA * lidt
                else:
                    idt_A = fake_B
                    loss_idt_A = loss_idt_B = jnp.float32(0)
                loss_G_A = gan(self._apply(
                    "netD_A", params["netD_A"], fake_B), True)
                loss_G_B = gan(self._apply(
                    "netD_B", params["netD_B"], fake_A), True)
                loss_cycle_A = cyc(rec_A, real_A) * lA
                loss_cycle_B = cyc(rec_B, real_B) * lB
                loss_G = (loss_G_A + loss_G_B + loss_cycle_A + loss_cycle_B
                          + loss_idt_A + loss_idt_B)
                aux = (fake_B, fake_A, rec_A, idt_A,
                       dict(G=loss_G, G_A=loss_G_A, G_B=loss_G_B,
                            cycle_A=loss_cycle_A, cycle_B=loss_cycle_B,
                            idt_A=loss_idt_A, idt_B=loss_idt_B))
                return loss_G, aux

            pg = {"netG_A": params["netG_A"], "netG_B": params["netG_B"]}
            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(pg)
            upd, opt_g = tx_g.update(grads, opt_g, pg)
            pg = optax.apply_updates(pg, upd)
            return pg, opt_g, aux

        @jax.jit
        def d_step(params, opt_d, real_A, real_B, pooled_fake_A,
                   pooled_fake_B):
            def loss_fn(pd):
                def d_basic(name, p, real, fake):
                    lr = gan(self._apply(name, p, real), True)
                    lf = gan(self._apply(name, p,
                                         jax.lax.stop_gradient(fake)), False)
                    return (lr + lf) * 0.5

                loss_D_A = d_basic("netD_A", pd["netD_A"], real_B,
                                   pooled_fake_B)
                loss_D_B = d_basic("netD_B", pd["netD_B"], real_A,
                                   pooled_fake_A)
                return loss_D_A + loss_D_B, (loss_D_A, loss_D_B)

            pd = {"netD_A": params["netD_A"], "netD_B": params["netD_B"]}
            (_, (dA, dB)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(pd)
            upd, opt_d = tx_d.update(grads, opt_d, pd)
            pd = optax.apply_updates(pd, upd)
            return pd, opt_d, dA, dB

        self._g_step, self._d_step = g_step, d_step

    def perform_training_step(self, mini_batch, post_transformations):
        real_A = self._batch_in(mini_batch["real_A"])
        real_B = self._batch_in(mini_batch["real_B"])
        if "background" in mini_batch:
            background = self._batch_in(mini_batch["background"])
        else:
            background = jax.random.uniform(self.next_rng(), real_A.shape)
        u = jax.random.uniform(self.next_rng(), real_A.shape)

        pg, self.opt_state["optimizer_G"], aux = self._g_step(
            self.params, self.opt_state["optimizer_G"], real_A, real_B,
            background, u)
        self.params.update(pg)
        fake_B, fake_A, rec_A, idt_A, losses = aux
        pooled_B = jnp.asarray(self.fake_B_pool.query(np.asarray(fake_B)))
        pooled_A = jnp.asarray(self.fake_A_pool.query(np.asarray(fake_A)))
        pd, self.opt_state["optimizer_D"], dA, dB = self._d_step(
            self.params, self.opt_state["optimizer_D"], real_A, real_B,
            pooled_A, pooled_B)
        self.params.update(pd)

        outputs = {
            "prediction": _post_first(post_transformations.get("prediction"),
                                      _nhwc_to_nchw(rec_A)),
            "label": _post_first(post_transformations.get("label"),
                                 _nhwc_to_nchw(real_A)),
            "fake_B": np.asarray(_nhwc_to_nchw(fake_B)[0:1, 0:1]),
            "idt_A": np.asarray(_nhwc_to_nchw(idt_A)[0:1, 0:1]),
            "real_B_seg": np.asarray(_nhwc_to_nchw(fake_A)[0:1, 0:1]),
        }
        out_losses = {k: float(v) for k, v in losses.items()}
        out_losses["D_A"] = float(dA)
        out_losses["D_B"] = float(dB)
        return outputs, out_losses

    def inference(self, mini_batch, post_transformations, phase=Phase.TEST):
        net = ("netG_A" if "netG_A" in self.params else "netG_B")
        return self._gen_inference(
            net, mini_batch, post_transformations, phase,
            getattr(self, "criterionCycle", None), "loss_criterionCycle")


def _sample_patch_ids(rng, sizes, num_patches):
    keys = jax.random.split(rng, len(sizes))
    return [jax.random.permutation(k, s)[: min(num_patches, s)]
            for k, s in zip(keys, sizes)]


@register("CUTModel")
class CUTAlgorithm(_UnpairedBase):
    """Contrastive unpaired translation (``cut.py:120-242``): D step on
    detached fakes, then joint G+F step with multilayer PatchNCE (+ identity
    NCE), patch ids shared between the key and query pools."""

    optimizer_mapping = {"optimizer_G": ["netG"], "optimizer_D": ["netD"],
                         "optimizer_F": ["netF"]}

    def __init__(self, config, phase, netG_config, netD_config=None,
                 netF_config=None, nce_layers="0,4,8,12,16", nce_idt=True,
                 lambda_NCE=1.0, lambda_GAN=1.0, flip_equivariance=False,
                 num_patches=256, inference=None, **kw):
        super().__init__(config, phase)
        self.inference_mode = inference or config["General"].get("inference")
        self.nce_layers = [int(i) for i in str(nce_layers).split(",")]
        self.nce_idt = nce_idt
        self.lambda_NCE = lambda_NCE
        self.lambda_GAN = lambda_GAN
        self.flip_equivariance = flip_equivariance
        self.num_patches = num_patches
        self.networks["netG"] = build_network(dict(netG_config),
                                              dtype=self.dtype)
        if phase == Phase.TRAIN:
            self.networks["netD"] = build_network(dict(netD_config),
                                                  dtype=self.dtype)
            cfgF = dict(netF_config or {"name": "PatchSamplerF"})
            cfgF.setdefault("use_mlp", True)
            self.networks["netF"] = build_network(cfgF)

    # -- shared init for CUT/NEGCUT ---------------------------------------
    def _init_cut(self, init_mini_batch, config, phase, extra_nets=()):
        tr = config.get(Phase.TRAIN, {})
        if phase != Phase.TEST:
            self.criterionGAN = losses_lib.get_loss_function_by_name(
                tr["loss_criterionGAN"], config)
        seed = config["General"].get("seed", 42)
        key = "real_A" if "real_A" in init_mini_batch else "image"
        a = np.asarray(init_mini_batch[key])
        shape = (1, a.shape[2], a.shape[3], a.shape[1])
        # init G and D by shape
        for i, name in enumerate(n for n in self.networks
                                 if n not in ("netF", "netF_", "netN")):
            variables = self.networks[name].init(
                jax.random.PRNGKey(seed + i), jnp.zeros(shape))
            self.params[name] = variables["params"]
            self.mutables[name] = {
                k: v for k, v in variables.items() if k != "params"}
        if phase == Phase.TRAIN:
            self.criterionNCE = losses_lib.get_loss_function_by_name(
                tr["loss_criterionNCE"], config)
            # netF lazy init via a dry encode (reference cut.py:80-84)
            feats = self._apply("netG", self.params["netG"],
                                jnp.zeros(shape), layers=self.nce_layers,
                                encode_only=True)
            self.feat_sizes = [f.shape[1] * f.shape[2] for f in feats]
            ids = _sample_patch_ids(jax.random.PRNGKey(0), self.feat_sizes,
                                    self.num_patches)
            vF = self.networks["netF"].init(
                jax.random.PRNGKey(seed + 17), feats, ids, self.num_patches)
            self.params["netF"] = vF["params"]
            self.mutables["netF"] = {}
            for name in extra_nets:
                pass  # handled by subclass

    def initialize_model_and_optimizer(self, init_mini_batch, config, args,
                                       phase=Phase.TRAIN):
        self._init_cut(init_mini_batch, config, phase)
        if phase == Phase.TRAIN:
            self._init_optimizers(config)
            if getattr(args, "start_epoch", 0) > 0:
                self._load_resume_checkpoints(config, args)
            self._build_steps()
        else:
            self.inference_mode = "netG"
            self._load_inference_checkpoint(config, args)

    def _nce_loss(self, pg, pf, src, tgt, ids):
        feat_q = self._apply("netG", pg, tgt, layers=self.nce_layers,
                             encode_only=True)
        feat_k = self._apply("netG", pg, src, layers=self.nce_layers,
                             encode_only=True)
        fk_pool, _ = self._apply("netF", pf, feat_k, ids, self.num_patches)
        fq_pool, _ = self._apply("netF", pf, feat_q, ids, self.num_patches)
        total = 0.0
        for f_q, f_k in zip(fq_pool, fk_pool):
            total += jnp.mean(self.criterionNCE(f_q, f_k)) * self.lambda_NCE
        return total / len(self.nce_layers)

    def _build_steps(self):
        gan = self.criterionGAN
        tx_g, tx_d, tx_f = (self.opt["optimizer_G"], self.opt["optimizer_D"],
                            self.opt["optimizer_F"])

        @jax.jit
        def step(params, opt_state, real_A, real_B, ids_a, ids_b):
            fake_B = self._apply("netG", params["netG"], real_A)
            idt_B = (self._apply("netG", params["netG"], real_B)
                     if self.nce_idt else None)

            # D update
            def d_loss(pd):
                lf = gan(self._apply("netD", pd,
                                     jax.lax.stop_gradient(fake_B)), False)
                lr = gan(self._apply("netD", pd, real_B), True)
                return (lf + lr) * 0.5, (lf, lr)

            (_, (loss_D_fake, loss_D_real)), gd = jax.value_and_grad(
                d_loss, has_aux=True)(params["netD"])
            upd, od = tx_d.update({"netD": gd}, opt_state["optimizer_D"],
                                  {"netD": params["netD"]})
            pd_new = optax.apply_updates({"netD": params["netD"]},
                                         upd)["netD"]

            # G + F update (uses the *updated* D, mirroring scaler.step order)
            def g_loss(pg, pf):
                fake_B_ = self._apply("netG", pg, real_A)
                loss_G_GAN = (gan(self._apply("netD", pd_new, fake_B_), True)
                              * self.lambda_GAN if self.lambda_GAN > 0
                              else jnp.float32(0))
                loss_NCE = (self._nce_loss(pg, pf, real_A, fake_B_, ids_a)
                            if self.lambda_NCE > 0 else jnp.float32(0))
                if self.nce_idt and self.lambda_NCE > 0:
                    idt_B_ = self._apply("netG", pg, real_B)
                    loss_NCE_Y = self._nce_loss(pg, pf, real_B, idt_B_, ids_b)
                    loss_NCE_both = (loss_NCE + loss_NCE_Y) * 0.5
                else:
                    loss_NCE_Y = jnp.float32(0)
                    loss_NCE_both = loss_NCE
                total = loss_G_GAN + loss_NCE_both
                return total, (loss_NCE, loss_NCE_Y)

            (loss_G, (loss_NCE, loss_NCE_Y)), (gg, gf) = jax.value_and_grad(
                g_loss, argnums=(0, 1), has_aux=True)(
                params["netG"], params["netF"])
            upd, og = tx_g.update({"netG": gg}, opt_state["optimizer_G"],
                                  {"netG": params["netG"]})
            pg_new = optax.apply_updates({"netG": params["netG"]},
                                         upd)["netG"]
            upd, of = tx_f.update({"netF": gf}, opt_state["optimizer_F"],
                                  {"netF": params["netF"]})
            pf_new = optax.apply_updates({"netF": params["netF"]},
                                         upd)["netF"]

            new_params = dict(params)
            new_params.update(netG=pg_new, netD=pd_new, netF=pf_new)
            new_opt = dict(opt_state)
            new_opt.update(optimizer_G=og, optimizer_D=od, optimizer_F=of)
            losses = dict(G=loss_G, loss_NCE=loss_NCE, loss_NCE_Y=loss_NCE_Y,
                          D_fake=loss_D_fake, D_real=loss_D_real)
            return new_params, new_opt, (fake_B, idt_B), losses

        self._step = step

    def perform_training_step(self, mini_batch, post_transformations):
        real_A = self._batch_in(mini_batch["real_A"])
        real_B = self._batch_in(mini_batch["real_B"])
        ids_a = _sample_patch_ids(self.next_rng(), self.feat_sizes,
                                  self.num_patches)
        ids_b = _sample_patch_ids(self.next_rng(), self.feat_sizes,
                                  self.num_patches)
        self.params, self.opt_state, (fake_B, idt_B), losses = self._step(
            self.params, self.opt_state, real_A, real_B, ids_a, ids_b)
        outputs = {
            "prediction": _post_first(post_transformations.get("prediction"),
                                      _nhwc_to_nchw(fake_B)),
            "label": _post_first(post_transformations.get("prediction"),
                                 _nhwc_to_nchw(real_B)),
            "idt_B": np.asarray(_nhwc_to_nchw(idt_B)[0:1, 0:1]),
        }
        return outputs, {k: float(v) for k, v in losses.items()}

    def inference(self, mini_batch, post_transformations, phase=Phase.TEST):
        return self._gen_inference("netG", mini_batch, post_transformations,
                                   phase)


@register("NEGCUTModel")
class NEGCUTAlgorithm(CUTAlgorithm):
    """NEGCUT (``negcut.py:129-279``): CUT plus an adversarial negative
    generator netN (maximizing the NCE loss) and an EMA mirror netF_."""

    optimizer_mapping = {"optimizer_G": ["netG"], "optimizer_D": ["netD"],
                         "optimizer_F": ["netF"], "optimizer_N": ["netN"]}

    def __init__(self, config, phase, netG_config, netD_config=None,
                 netF_config=None, netN_config=None,
                 nce_layers="0,4,8,12,16", nce_idt=True, lambda_NCE=1.0,
                 lambda_GAN=1.0, lambda_MS_neg=1.0, flip_equivariance=False,
                 num_patches=256, inference=None, **kw):
        super().__init__(config, phase, netG_config, netD_config, netF_config,
                         nce_layers, nce_idt, lambda_NCE, lambda_GAN,
                         flip_equivariance, num_patches, inference)
        self.lambda_MS_neg = lambda_MS_neg
        if phase == Phase.TRAIN:
            self.networks["netN"] = build_network(
                dict(netN_config or {"name": "Negative_Generator"}))

    def initialize_model_and_optimizer(self, init_mini_batch, config, args,
                                       phase=Phase.TRAIN):
        self._init_cut(init_mini_batch, config, phase)
        if phase != Phase.TRAIN:
            self.inference_mode = "netG"
            self._load_inference_checkpoint(config, args)
            return
        seed = config["General"].get("seed", 42)
        # netF_ = EMA mirror of netF; netN init from full-feature pools
        self.params["netF_"] = jax.tree.map(lambda x: x, self.params["netF"])
        key = "real_A" if "real_A" in init_mini_batch else "image"
        a = np.asarray(init_mini_batch[key])
        shape = (1, a.shape[2], a.shape[3], a.shape[1])
        feats = self._apply("netG", self.params["netG"], jnp.zeros(shape),
                            layers=self.nce_layers, encode_only=True)
        pools, _ = self.networks["netF"].apply(
            {"params": self.params["netF_"]}, feats, None, 0)
        vN = self.networks["netN"].init(
            jax.random.PRNGKey(seed + 23), pools, self.num_patches,
            jax.random.PRNGKey(0))
        self.params["netN"] = vN["params"]
        self.mutables["netN"] = {}
        self._init_optimizers(config)
        if getattr(args, "start_epoch", 0) > 0:
            self._load_resume_checkpoints(config, args)
        self._build_steps()

    def _neg_pools(self, pg, pf_, pn, src, rng):
        feat_k = self._apply("netG", pg, src, layers=self.nce_layers,
                             encode_only=True)
        pools, _ = self.networks["netF"].apply({"params": pf_}, feat_k,
                                               None, 0)
        return self.networks["netN"].apply(
            {"params": pn}, pools, self.num_patches, rng)

    def _nce_loss_neg(self, pg, pf, pf_, pn, src, tgt, ids, rng,
                      detach_qk=False):
        feat_q = self._apply("netG", pg, tgt, layers=self.nce_layers,
                             encode_only=True)
        feat_k = self._apply("netG", pg, src, layers=self.nce_layers,
                             encode_only=True)
        fk_pool, _ = self._apply("netF", pf, feat_k, ids, self.num_patches)
        fq_pool, _ = self._apply("netF", pf, feat_q, ids, self.num_patches)
        neg_pool = self._neg_pools(pg, pf_, pn, src, rng)
        total = 0.0
        for f_q, f_k, n_k in zip(fq_pool, fk_pool, neg_pool):
            if detach_qk:
                f_q = jax.lax.stop_gradient(f_q)
                f_k = jax.lax.stop_gradient(f_k)
            total += jnp.mean(
                self.criterionNCE(f_q, f_k, n_k)) * self.lambda_NCE
        return total / len(self.nce_layers), neg_pool

    def _build_steps(self):
        gan = self.criterionGAN
        tx = self.opt

        @jax.jit
        def step(params, opt_state, real_A, real_B, ids_a, ids_b, rng):
            r1, r2, r3, r4 = jax.random.split(rng, 4)
            fake_B = self._apply("netG", params["netG"], real_A)
            idt_B = (self._apply("netG", params["netG"], real_B)
                     if self.nce_idt else None)

            # --- D update ---
            def d_loss(pd):
                lf = gan(self._apply("netD", pd,
                                     jax.lax.stop_gradient(fake_B)), False)
                lr = gan(self._apply("netD", pd, real_B), True)
                return (lf + lr) * 0.5, (lf, lr)

            (_, (lDf, lDr)), gd = jax.value_and_grad(
                d_loss, has_aux=True)(params["netD"])
            upd, od = tx["optimizer_D"].update(
                {"netD": gd}, opt_state["optimizer_D"],
                {"netD": params["netD"]})
            pd_new = optax.apply_updates({"netD": params["netD"]},
                                         upd)["netD"]

            # --- N update: maximize NCE + MS diversity ---
            def n_loss(pn):
                l1, negs1 = self._nce_loss_neg(
                    params["netG"], params["netF"], params["netF_"], pn,
                    real_A, jax.lax.stop_gradient(fake_B), ids_a, r1,
                    detach_qk=True)
                if self.nce_idt:
                    l2, negs = self._nce_loss_neg(
                        params["netG"], params["netF"], params["netF_"], pn,
                        real_B, jax.lax.stop_gradient(idt_B), ids_b, r2,
                        detach_qk=True)
                    l_both = (l1 + l2) * 0.5
                else:
                    negs = negs1
                    l_both = l1
                ms = 0.0
                if self.lambda_MS_neg > 0:
                    for n_k in negs:
                        nk = n_k.reshape(-1, self.num_patches, n_k.shape[-1])
                        half = self.num_patches // 2
                        ms += (-jnp.mean(jnp.abs(nk[:, :half] - nk[:, half:]))
                               * self.lambda_MS_neg)
                    ms = ms / len(self.nce_layers)
                return -l_both + ms

            lN, gn = jax.value_and_grad(n_loss)(params["netN"])
            upd, on = tx["optimizer_N"].update(
                {"netN": gn}, opt_state["optimizer_N"],
                {"netN": params["netN"]})
            pn_new = optax.apply_updates({"netN": params["netN"]},
                                         upd)["netN"]

            # --- G + F update ---
            def g_loss(pg, pf):
                fake_B_ = self._apply("netG", pg, real_A)
                lg = (gan(self._apply("netD", pd_new, fake_B_), True)
                      * self.lambda_GAN if self.lambda_GAN > 0
                      else jnp.float32(0))
                lnce, _ = self._nce_loss_neg(
                    pg, pf, params["netF_"], pn_new, real_A, fake_B_,
                    ids_a, r3)
                if self.nce_idt:
                    idt_B_ = self._apply("netG", pg, real_B)
                    lnce_y, _ = self._nce_loss_neg(
                        pg, pf, params["netF_"], pn_new, real_B, idt_B_,
                        ids_b, r4)
                    l_both = (lnce + lnce_y) * 0.5
                else:
                    lnce_y = jnp.float32(0)
                    l_both = lnce
                return lg + l_both, (lnce, lnce_y)

            (lG, (lnce, lnce_y)), (gg, gf) = jax.value_and_grad(
                g_loss, argnums=(0, 1), has_aux=True)(
                params["netG"], params["netF"])
            upd, og = tx["optimizer_G"].update(
                {"netG": gg}, opt_state["optimizer_G"],
                {"netG": params["netG"]})
            pg_new = optax.apply_updates({"netG": params["netG"]},
                                         upd)["netG"]
            upd, of = tx["optimizer_F"].update(
                {"netF": gf}, opt_state["optimizer_F"],
                {"netF": params["netF"]})
            pf_new = optax.apply_updates({"netF": params["netF"]},
                                         upd)["netF"]
            # EMA mirror update (reference accumulate, decay 0.9)
            pf_ema = jax.tree.map(lambda a, b: a * 0.9 + b * 0.1,
                                  params["netF_"], pf_new)

            new_params = dict(params)
            new_params.update(netG=pg_new, netD=pd_new, netF=pf_new,
                              netN=pn_new, netF_=pf_ema)
            new_opt = dict(opt_state)
            new_opt.update(optimizer_G=og, optimizer_D=od, optimizer_F=of,
                           optimizer_N=on)
            losses = dict(G=lG, loss_NCE=lnce, loss_NCE_Y=lnce_y,
                          D_fake=lDf, D_real=lDr, N=lN)
            return new_params, new_opt, (fake_B, idt_B), losses

        self._step = step

    def perform_training_step(self, mini_batch, post_transformations):
        real_A = self._batch_in(mini_batch["real_A"])
        real_B = self._batch_in(mini_batch["real_B"])
        ids_a = _sample_patch_ids(self.next_rng(), self.feat_sizes,
                                  self.num_patches)
        ids_b = _sample_patch_ids(self.next_rng(), self.feat_sizes,
                                  self.num_patches)
        self.params, self.opt_state, (fake_B, idt_B), losses = self._step(
            self.params, self.opt_state, real_A, real_B, ids_a, ids_b,
            self.next_rng())
        outputs = {
            "prediction": _post_first(post_transformations.get("prediction"),
                                      _nhwc_to_nchw(fake_B)),
            "label": _post_first(post_transformations.get("prediction"),
                                 _nhwc_to_nchw(real_B)),
            "idt_B": np.asarray(_nhwc_to_nchw(idt_B)[0:1, 0:1]),
        }
        return outputs, {k: float(v) for k, v in losses.items()}

    def network_state(self, name):  # include netF_ in checkpoints via netF
        return super().network_state(name)


@register("DCLGAN")
class DCLGANAlgorithm(_UnpairedBase):
    """Dual contrastive learning GAN (``dclgan.py:183-293``): two generators,
    two discriminators, two patch projectors, NCE in both directions +
    identity + ImagePool D replay. D step first, then G+F."""

    optimizer_mapping = {"optimizer_G": ["netG_A", "netG_B"],
                         "optimizer_D": ["netD_A", "netD_B"],
                         "optimizer_F": ["netF1", "netF2"]}

    def __init__(self, config, phase, netG_A_config, netG_B_config,
                 netD_A_config=None, netD_B_config=None, netF1_config=None,
                 netF2_config=None, nce_layers="0,4,8,12,16",
                 lambda_A=10.0, lambda_B=10.0, lambda_idt=0.5,
                 lambda_NCE=2.0, lambda_GAN=1.0, num_patches=256,
                 pool_size=50, inference=None, **kw):
        super().__init__(config, phase)
        self.inference_mode = inference or config["General"].get("inference")
        self.nce_layers = [int(i) for i in str(nce_layers).split(",")]
        self.lambda_A, self.lambda_B = lambda_A, lambda_B
        self.lambda_idt, self.lambda_NCE = lambda_idt, lambda_NCE
        self.lambda_GAN = lambda_GAN
        self.num_patches = num_patches
        if phase == Phase.TRAIN or self.inference_mode == "netG_A":
            self.networks["netG_A"] = build_network(dict(netG_A_config),
                                                    dtype=self.dtype)
        if phase == Phase.TRAIN or self.inference_mode == "netG_B":
            self.networks["netG_B"] = build_network(dict(netG_B_config),
                                                    dtype=self.dtype)
        if phase == Phase.TRAIN:
            self.networks["netD_A"] = build_network(dict(netD_A_config),
                                                    dtype=self.dtype)
            self.networks["netD_B"] = build_network(dict(netD_B_config),
                                                    dtype=self.dtype)
            for nm, cfg in (("netF1", netF1_config), ("netF2", netF2_config)):
                c = dict(cfg or {"name": "PatchSamplerF"})
                c.setdefault("use_mlp", True)
                self.networks[nm] = build_network(c)
            seed = config["General"].get("seed", 42)
            self.fake_A_pool = ImagePool(pool_size, seed)
            self.fake_B_pool = ImagePool(pool_size, seed + 1)

    def initialize_model_and_optimizer(self, init_mini_batch, config, args,
                                       phase=Phase.TRAIN):
        tr = config.get(Phase.TRAIN, {})
        if phase != Phase.TEST:
            self.criterionGAN = losses_lib.get_loss_function_by_name(
                tr["loss_criterionGAN"], config)
            self.criterionCycle = losses_lib.get_loss_function_by_name(
                tr.get("loss_criterionCycle", "L1Loss"), config)
            self.criterionIdt = losses_lib.get_loss_function_by_name(
                tr.get("loss_criterionIdt", "L1Loss"), config)
        seed = config["General"].get("seed", 42)
        key = "real_A" if "real_A" in init_mini_batch else "image"
        a = np.asarray(init_mini_batch[key])
        shape = (1, a.shape[2], a.shape[3], a.shape[1])
        for i, name in enumerate(n for n in self.networks
                                 if not n.startswith("netF")):
            variables = self.networks[name].init(
                jax.random.PRNGKey(seed + i), jnp.zeros(shape))
            self.params[name] = variables["params"]
            self.mutables[name] = {
                k: v for k, v in variables.items() if k != "params"}
        if phase != Phase.TRAIN:
            self._load_inference_checkpoint(config, args)
            return
        self.criterionNCE = losses_lib.get_loss_function_by_name(
            tr["loss_criterionNCE"], config)
        feats = self._apply("netG_A", self.params["netG_A"],
                            jnp.zeros(shape), layers=self.nce_layers,
                            encode_only=True)
        self.feat_sizes = [f.shape[1] * f.shape[2] for f in feats]
        ids = _sample_patch_ids(jax.random.PRNGKey(0), self.feat_sizes,
                                self.num_patches)
        for j, nm in enumerate(("netF1", "netF2")):
            v = self.networks[nm].init(jax.random.PRNGKey(seed + 31 + j),
                                       feats, ids, self.num_patches)
            self.params[nm] = v["params"]
            self.mutables[nm] = {}
        self._init_optimizers(config)
        if getattr(args, "start_epoch", 0) > 0:
            self._load_resume_checkpoints(config, args)
        self._build_steps()

    def _nce(self, enc_q, enc_k, fq_net, fk_net, pg, pf, src, tgt, ids):
        feat_q = self._apply(enc_q, pg[enc_q], tgt, layers=self.nce_layers,
                             encode_only=True)
        feat_k = self._apply(enc_k, pg[enc_k], src, layers=self.nce_layers,
                             encode_only=True)
        fk_pool, _ = self._apply(fk_net, pf[fk_net], feat_k, ids,
                                 self.num_patches)
        fq_pool, _ = self._apply(fq_net, pf[fq_net], feat_q, ids,
                                 self.num_patches)
        total = 0.0
        for f_q, f_k in zip(fq_pool, fk_pool):
            total += jnp.mean(self.criterionNCE(f_q, f_k))
        return total / len(self.nce_layers)

    def _build_steps(self):
        gan, idt = self.criterionGAN, self.criterionIdt
        tx = self.opt

        @jax.jit
        def d_step(params, opt_d, real_A, real_B, pooled_A, pooled_B):
            def loss_fn(pd):
                def d_basic(name, p, real, fake):
                    lr = gan(self._apply(name, p, real), True)
                    lf = gan(self._apply(name, p,
                                         jax.lax.stop_gradient(fake)), False)
                    return (lr + lf) * 0.5

                lA = d_basic("netD_A", pd["netD_A"], real_B, pooled_B)
                lB = d_basic("netD_B", pd["netD_B"], real_A, pooled_A)
                return lA + lB, (lA, lB)

            pd = {"netD_A": params["netD_A"], "netD_B": params["netD_B"]}
            (_, (lA, lB)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(pd)
            upd, opt_d = tx["optimizer_D"].update(grads, opt_d, pd)
            return optax.apply_updates(pd, upd), opt_d, lA, lB

        @jax.jit
        def g_step(params, opt_g, opt_f, real_A, real_B, background, u,
                   ids1, ids2):
            bg = background * u

            def loss_fn(pg, pf):
                fake_B = self._apply("netG_A", pg["netG_A"],
                                     jnp.maximum(real_A, bg))
                rec_A = self._apply("netG_B", pg["netG_B"], fake_B)
                fake_A = self._apply("netG_B", pg["netG_B"], real_B)
                if self.lambda_idt > 0:
                    idt_A = self._apply("netG_A", pg["netG_A"], real_B)
                    l_idt_A = (idt(idt_A, real_B)
                               * self.lambda_B * self.lambda_idt)
                    idt_B = self._apply("netG_B", pg["netG_B"], real_A)
                    l_idt_B = (idt(idt_B, real_A)
                               * self.lambda_A * self.lambda_idt)
                else:
                    idt_A = fake_B
                    l_idt_A = l_idt_B = jnp.float32(0)
                lGA = gan(self._apply("netD_A", params["netD_A"], fake_B),
                          True)
                lGB = gan(self._apply("netD_B", params["netD_B"], fake_A),
                          True)
                if self.lambda_NCE > 0:
                    nce1 = self._nce("netG_B", "netG_A", "netF2", "netF1",
                                     pg, pf, real_A, fake_B,
                                     ids1) * self.lambda_NCE
                    nce2 = self._nce("netG_A", "netG_B", "netF1", "netF2",
                                     pg, pf, real_B, fake_A,
                                     ids2) * self.lambda_NCE
                else:
                    nce1 = nce2 = jnp.float32(0)
                loss_G = ((lGA + lGB) * 0.5 + (nce1 + nce2) * 0.5
                          + (l_idt_A + l_idt_B) * 0.5)
                aux = (fake_B, fake_A, rec_A, idt_A,
                       dict(G=loss_G, G_A=lGA, G_B=lGB, NCE1=nce1, NCE2=nce2,
                            idt_A=l_idt_A, idt_B=l_idt_B))
                return loss_G, aux

            pg = {"netG_A": params["netG_A"], "netG_B": params["netG_B"]}
            pf = {"netF1": params["netF1"], "netF2": params["netF2"]}
            (_, aux), (gg, gf) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(pg, pf)
            upd, opt_g = tx["optimizer_G"].update(gg, opt_g, pg)
            pg = optax.apply_updates(pg, upd)
            upd, opt_f = tx["optimizer_F"].update(gf, opt_f, pf)
            pf = optax.apply_updates(pf, upd)
            return pg, pf, opt_g, opt_f, aux

        self._d_step, self._g_step = d_step, g_step

    def perform_training_step(self, mini_batch, post_transformations):
        real_A = self._batch_in(mini_batch["real_A"])
        real_B = self._batch_in(mini_batch["real_B"])
        if "background" in mini_batch:
            background = self._batch_in(mini_batch["background"])
        else:
            background = jax.random.uniform(self.next_rng(), real_A.shape)
        u = jax.random.uniform(self.next_rng(), real_A.shape)
        ids1 = _sample_patch_ids(self.next_rng(), self.feat_sizes,
                                 self.num_patches)
        ids2 = _sample_patch_ids(self.next_rng(), self.feat_sizes,
                                 self.num_patches)

        # reference order: compute fakes, D step on pooled fakes, then G+F
        fake_B = self._apply("netG_A", self.params["netG_A"],
                             jnp.maximum(real_A, background * u))
        fake_A = self._apply("netG_B", self.params["netG_B"], real_B)
        pooled_B = jnp.asarray(self.fake_B_pool.query(np.asarray(fake_B)))
        pooled_A = jnp.asarray(self.fake_A_pool.query(np.asarray(fake_A)))
        pd, self.opt_state["optimizer_D"], dA, dB = self._d_step(
            self.params, self.opt_state["optimizer_D"], real_A, real_B,
            pooled_A, pooled_B)
        self.params.update(pd)
        pg, pf, self.opt_state["optimizer_G"], self.opt_state["optimizer_F"], \
            aux = self._g_step(
                self.params, self.opt_state["optimizer_G"],
                self.opt_state["optimizer_F"], real_A, real_B, background, u,
                ids1, ids2)
        self.params.update(pg)
        self.params.update(pf)
        fake_B, fake_A, rec_A, idt_A, losses = aux
        outputs = {
            "prediction": _post_first(post_transformations.get("prediction"),
                                      _nhwc_to_nchw(rec_A)),
            "label": _post_first(post_transformations.get("label"),
                                 _nhwc_to_nchw(real_A)),
            "fake_B": np.asarray(_nhwc_to_nchw(fake_B)[0:1, 0:1]),
            "idt_A": np.asarray(_nhwc_to_nchw(idt_A)[0:1, 0:1]),
            "real_B_seg": np.asarray(_nhwc_to_nchw(fake_A)[0:1, 0:1]),
        }
        out = {k: float(v) for k, v in losses.items()}
        out["D_A"] = float(dA)
        out["D_B"] = float(dB)
        return outputs, out

    def inference(self, mini_batch, post_transformations, phase=Phase.TEST):
        net = "netG_A" if "netG_A" in self.params else "netG_B"
        return self._gen_inference(
            net, mini_batch, post_transformations, phase,
            getattr(self, "criterionCycle", None), "L1_cycle")


@register("NiceGAN")
class NiceGANAlgorithm(_UnpairedBase):
    """NICE-GAN (``nice_gan.py:119-240``): the discriminator encoder doubles
    as the translation encoder; multi-scale adversarial + CAM + cycle +
    reconstruction losses. Spectral-norm power-iteration state threads
    through the jitted steps as a mutable collection."""

    optimizer_mapping = {"G_optim": ["gen2A", "gen2B"],
                         "D_optim": ["disA", "disB"]}

    def __init__(self, config, phase, gen2B_config=None, gen2A_config=None,
                 disA_config=None, disB_config=None, adv_weight=1.0,
                 cycle_weight=10.0, recon_weight=1.0, inference=None, **kw):
        super().__init__(config, phase)
        self.inference_mode = inference or config["General"].get("inference")
        self.adv_weight = adv_weight
        self.cycle_weight = cycle_weight
        self.recon_weight = recon_weight
        if phase == Phase.TRAIN or self.inference_mode == "gen2A":
            self.networks["gen2A"] = build_network(dict(gen2A_config),
                                                   dtype=self.dtype)
            self.networks["disB"] = build_network(dict(disB_config),
                                                  dtype=self.dtype)
        if phase == Phase.TRAIN or self.inference_mode == "gen2B":
            self.networks["gen2B"] = build_network(dict(gen2B_config),
                                                   dtype=self.dtype)
            self.networks["disA"] = build_network(dict(disA_config),
                                                  dtype=self.dtype)

    def initialize_model_and_optimizer(self, init_mini_batch, config, args,
                                       phase=Phase.TRAIN):
        tr = config.get(Phase.TRAIN, {})
        if phase != Phase.TEST:
            self.ad_loss = losses_lib.get_loss_function_by_name(
                tr["loss_ad"], config)
            self.cycle_loss = losses_lib.get_loss_function_by_name(
                tr["loss_cycle"], config)
        seed = config["General"].get("seed", 42)
        key = "real_A" if "real_A" in init_mini_batch else "image"
        a = np.asarray(init_mini_batch[key])
        img_shape = (1, a.shape[2], a.shape[3], a.shape[1])
        # discriminators first (z shape feeds the generators)
        z = None
        for i, name in enumerate(n for n in self.networks
                                 if n.startswith("dis")):
            v = self.networks[name].init(jax.random.PRNGKey(seed + i),
                                         jnp.zeros(img_shape))
            self.params[name] = v["params"]
            self.mutables[name] = {k: m for k, m in v.items()
                                   if k != "params"}
            out = self.networks[name].apply(v, jnp.zeros(img_shape),
                                            mutable=["spectral"])
            z = out[0][4]
        for i, name in enumerate(n for n in self.networks
                                 if n.startswith("gen")):
            v = self.networks[name].init(jax.random.PRNGKey(seed + 7 + i),
                                         jnp.zeros(z.shape))
            self.params[name] = v["params"]
            self.mutables[name] = {k: m for k, m in v.items()
                                   if k != "params"}
        if phase == Phase.TRAIN:
            self._init_optimizers(config)
            if getattr(args, "start_epoch", 0) > 0:
                self._load_resume_checkpoints(config, args)
            self._build_steps()
        else:
            net = self.inference_mode
            self._load_inference_checkpoint(config, args)
            # also load the paired discriminator-encoder
            dis = "disA" if net == "gen2B" else "disB"
            import os

            from octa_tpu.io.checkpoints import load_checkpoint

            ckdir = os.path.join(config["Output"]["save_dir"], "checkpoints")
            tag = getattr(args, "epoch", "latest") or "latest"
            p = os.path.join(ckdir, f"{tag}_{dis}_model.ckpt")
            if os.path.exists(p):
                self.load_network_state(dis, {"params": load_checkpoint(p)["model"]})

    def _dis(self, name, params, x, mutables):
        (out0, out1, cam, heat, z), new_mut = self.networks[name].apply(
            {"params": params, **mutables}, x, mutable=["spectral"])
        return (out0, out1, cam, z), new_mut

    def _build_steps(self):
        ad, cyc = self.ad_loss, self.cycle_loss
        aw, cw, rw = self.adv_weight, self.cycle_weight, self.recon_weight
        tx = self.opt

        @jax.jit
        def step(params, mutables, opt_state, real_A, real_B, background, u):
            bg = background * u

            # --- D update ---
            def d_loss(pd):
                (rLA, rGA, rcamA, real_A_z), mA = self._dis(
                    "disA", pd["disA"], real_A, mutables["disA"])
                (rLB, rGB, rcamB, real_B_z), mB = self._dis(
                    "disB", pd["disB"], real_B, mutables["disB"])
                fake_A2B = self._apply("gen2B", params["gen2B"],
                                       jax.lax.stop_gradient(real_A_z))
                fake_B2A = self._apply("gen2A", params["gen2A"],
                                       jax.lax.stop_gradient(real_B_z))
                fake_A2B = jax.lax.stop_gradient(fake_A2B)
                fake_B2A = jax.lax.stop_gradient(fake_B2A)
                (fLA, fGA, fcamA, _), mA = self._dis(
                    "disA", pd["disA"], fake_B2A, mA)
                (fLB, fGB, fcamB, _), mB = self._dis(
                    "disB", pd["disB"], fake_A2B, mB)

                def pair(rl, fl):
                    return (ad(rl, jnp.ones_like(rl))
                            + ad(fl, jnp.zeros_like(fl)))

                D_loss_A = aw * (pair(rGA, fGA) + pair(rcamA, fcamA)
                                 + pair(rLA, fLA))
                D_loss_B = aw * (pair(rGB, fGB) + pair(rcamB, fcamB)
                                 + pair(rLB, fLB))
                return D_loss_A + D_loss_B, (D_loss_A, D_loss_B,
                                             {"disA": mA, "disB": mB})

            pd = {"disA": params["disA"], "disB": params["disB"]}
            (_, (dA, dB, new_mut)), gd = jax.value_and_grad(
                d_loss, has_aux=True)(pd)
            upd, od = tx["D_optim"].update(gd, opt_state["D_optim"], pd)
            pd = optax.apply_updates(pd, upd)

            # --- G update ---
            def g_loss(pg):
                (_, _, _, real_A_z), mA = self._dis(
                    "disA", pd["disA"], jnp.maximum(real_A, bg),
                    new_mut["disA"])
                (_, _, _, real_B_z), mB = self._dis(
                    "disB", pd["disB"], real_B, new_mut["disB"])
                fake_A2B = self._apply("gen2B", pg["gen2B"], real_A_z)
                fake_B2A = self._apply("gen2A", pg["gen2A"], real_B_z)
                (fLA, fGA, fcamA, fake_A_z), mA = self._dis(
                    "disA", pd["disA"], jnp.maximum(fake_B2A, bg), mA)
                (fLB, fGB, fcamB, fake_B_z), mB = self._dis(
                    "disB", pd["disB"], fake_A2B, mB)
                fake_B2A2B = self._apply("gen2B", pg["gen2B"], fake_A_z)
                fake_A2B2A = self._apply("gen2A", pg["gen2A"], fake_B_z)
                G_ad_A = (ad(fGA, jnp.ones_like(fGA))
                          + ad(fcamA, jnp.ones_like(fcamA))
                          + ad(fLA, jnp.ones_like(fLA)))
                G_ad_B = (ad(fGB, jnp.ones_like(fGB))
                          + ad(fcamB, jnp.ones_like(fcamB))
                          + ad(fLB, jnp.ones_like(fLB)))
                G_cycle_A = cyc(fake_A2B2A, real_A)
                G_cycle_B = cyc(fake_B2A2B, real_B)
                fake_A2A = self._apply("gen2A", pg["gen2A"], real_A_z)
                fake_B2B = self._apply("gen2B", pg["gen2B"], real_B_z)
                G_recon_A = cyc(fake_A2A, real_A)
                G_recon_B = cyc(fake_B2B, real_B)
                G_loss_A = aw * G_ad_A + cw * G_cycle_A + rw * G_recon_A
                G_loss_B = aw * G_ad_B + cw * G_cycle_B + rw * G_recon_B
                total = G_loss_A + G_loss_B
                aux = (fake_A2B, fake_B2A, fake_A2B2A, fake_B2B,
                       {"disA": mA, "disB": mB},
                       dict(G=total, G_A=G_loss_A, G_B=G_loss_B,
                            cycle_A=G_cycle_A, cycle_B=G_cycle_B,
                            idt_A=G_recon_A, idt_B=G_recon_B))
                return total, aux

            pg = {"gen2A": params["gen2A"], "gen2B": params["gen2B"]}
            (_, aux), gg = jax.value_and_grad(g_loss, has_aux=True)(pg)
            fake_A2B, fake_B2A, fake_A2B2A, fake_B2B, new_mut2, g_losses = aux
            upd, og = tx["G_optim"].update(gg, opt_state["G_optim"], pg)
            pg = optax.apply_updates(pg, upd)

            new_params = dict(params)
            new_params.update(pd)
            new_params.update(pg)
            new_opt = dict(opt_state)
            new_opt.update(D_optim=od, G_optim=og)
            losses = dict(g_losses)
            losses["D_A"] = dA
            losses["D_B"] = dB
            return (new_params, new_mut2, new_opt,
                    (fake_A2B, fake_B2A, fake_A2B2A, fake_B2B), losses)

        self._step = step

    def perform_training_step(self, mini_batch, post_transformations):
        real_A = self._batch_in(mini_batch["real_A"])
        real_B = self._batch_in(mini_batch["real_B"])
        if "background" in mini_batch:
            background = self._batch_in(mini_batch["background"])
        else:
            background = jax.random.uniform(self.next_rng(), real_A.shape)
        u = jax.random.uniform(self.next_rng(), real_A.shape)
        dis_mut = {"disA": self.mutables["disA"],
                   "disB": self.mutables["disB"]}
        self.params, new_mut, self.opt_state, outs, losses = self._step(
            self.params, dis_mut, self.opt_state, real_A, real_B,
            background, u)
        self.mutables.update(new_mut)
        fake_A2B, fake_B2A, fake_A2B2A, fake_B2B = outs
        outputs = {
            "prediction": _post_first(post_transformations.get("prediction"),
                                      _nhwc_to_nchw(fake_A2B2A)),
            "label": _post_first(post_transformations.get("label"),
                                 _nhwc_to_nchw(real_A)),
            "fake_B": np.asarray(_nhwc_to_nchw(fake_A2B)[0:1, 0:1]),
            "idt_B": np.asarray(_nhwc_to_nchw(fake_B2B)[0:1, 0:1]),
            "real_B_seg": np.asarray(_nhwc_to_nchw(fake_B2A)[0:1, 0:1]),
        }
        return outputs, {k: float(v) for k, v in losses.items()}

    def inference(self, mini_batch, post_transformations, phase=Phase.TEST):
        x = self._batch_in(mini_batch["image"])
        if "gen2B" in self.params:
            (out0, out1, cam, heat, z), _ = self.networks["disA"].apply(
                {"params": self.params["disA"], **self.mutables["disA"]}, x,
                mutable=["spectral"])
            pred = self._apply("gen2B", self.params["gen2B"], z)
        else:
            (out0, out1, cam, heat, z), _ = self.networks["disB"].apply(
                {"params": self.params["disB"], **self.mutables["disB"]}, x,
                mutable=["spectral"])
            pred = self._apply("gen2A", self.params["gen2A"], z)
        outputs = {"prediction": _post_first(
            post_transformations.get("prediction"), _nhwc_to_nchw(pred))}
        losses = {}
        if phase == Phase.VALIDATION and "label" in mini_batch:
            y = self._batch_in(mini_batch["label"])
            outputs["label"] = _post_first(
                post_transformations.get("label"),
                np.asarray(mini_batch["label"]))
            losses["loss_cycle"] = self.cycle_loss(pred, y)
        return outputs, losses
