"""One training step of every GAN algorithm at tiny resolution — verifies the
jitted multi-optimizer steps run, losses are finite, and parameters update."""
import jax
import numpy as np
import pytest

from octa_tpu.train.algorithms import GanSegAlgorithm, define_model
from octa_tpu.utils.enums import Phase

RES = 64


def _batch(keys, rng, res=RES):
    return {k: rng.random((2, 1, res, res), dtype=np.float32) for k in keys}


def _post():
    return {"prediction": None, "label": None}


class Args:
    start_epoch = 0
    epoch = "latest"


def _base_config(extra_train):
    cfg = {
        "General": {"task": "gan-ves-seg", "seed": 0, "amp": False,
                    "inference": None},
        "Train": {"epochs": 2, "epochs_decay": 0, "batch_size": 2,
                  "lr": 2e-4, **extra_train},
        "Output": {"save_dir": "/tmp/gan-test", "save_to_disk": False},
    }
    return cfg


def _params_changed(before, after):
    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        before, after))
    return max(diffs) > 0


def _run_one_step(algo, cfg, keys):
    rng = np.random.default_rng(0)
    batch = _batch(keys, rng)
    batch["real_A_path"] = ["a"] * 2
    batch["real_B_path"] = ["b"] * 2
    init = dict(batch)
    init["image"] = init["real_A"]
    algo.initialize_model_and_optimizer(init, cfg, Args(), phase=Phase.TRAIN)
    before = jax.tree.map(lambda x: np.asarray(x).copy(), algo.params)
    outputs, losses = algo.perform_training_step(batch, _post())
    assert all(np.isfinite(v) for v in losses.values()), losses
    assert _params_changed(before, algo.params)
    assert np.asarray(outputs["prediction"][0]).shape[-2:] == (RES, RES)
    algo.scheduler_step(0)
    return outputs, losses


def test_cycle_gan_step():
    cfg = _base_config({"loss_criterionGAN": "LSGANLoss",
                        "loss_criterionCycle": "L1Loss",
                        "loss_criterionIdt": "L1Loss"})
    algo = define_model({**cfg, "General": {
        **cfg["General"],
        "model": {"name": "CycleGAN",
                  "netG_A_config": {"name": "resnetGenerator9"},
                  "netG_B_config": {"name": "resnetGenerator9"},
                  "netD_A_config": {"name": "patchGAN70x70"},
                  "netD_B_config": {"name": "patchGAN70x70"},
                  "lambda_A": 10, "lambda_B": 10, "lambda_idt": 0.5,
                  "pool_size": 50}}}, Phase.TRAIN)
    outputs, losses = _run_one_step(algo, cfg,
                                    ["real_A", "real_B", "background"])
    for k in ("G", "G_A", "G_B", "D_A", "D_B", "cycle_A", "cycle_B",
              "idt_A", "idt_B"):
        assert k in losses


def test_cut_step():
    cfg = _base_config({"loss_criterionGAN": "LSGANLoss",
                        "loss_criterionNCE": "PatchNCELoss"})
    algo = define_model({**cfg, "General": {
        **cfg["General"],
        "model": {"name": "CUTModel",
                  "netG_config": {"name": "resnetGenerator9"},
                  "netD_config": {"name": "patchGAN70x70"},
                  "netF_config": {"name": "PatchSamplerF", "use_mlp": True,
                                  "nc": 256},
                  "nce_layers": "0,4,8,12,16", "nce_idt": True,
                  "lambda_NCE": 1, "lambda_GAN": 1,
                  "flip_equivariance": False, "num_patches": 64}}},
        Phase.TRAIN)
    outputs, losses = _run_one_step(algo, cfg, ["real_A", "real_B"])
    assert "loss_NCE" in losses and "D_fake" in losses
    assert losses["loss_NCE"] > 0


def test_negcut_step():
    cfg = _base_config({"loss_criterionGAN": "LSGANLoss",
                        "loss_criterionNCE": "LearnedPatchNCELoss"})
    algo = define_model({**cfg, "General": {
        **cfg["General"],
        "model": {"name": "NEGCUTModel",
                  "netG_config": {"name": "resnetGenerator9"},
                  "netD_config": {"name": "patchGAN70x70"},
                  "netF_config": {"name": "PatchSamplerF", "use_mlp": True,
                                  "nc": 256},
                  "netN_config": {"name": "Negative_Generator", "nc": 256,
                                  "z_dim": 64},
                  "nce_layers": "0,4,8", "nce_idt": True,
                  "lambda_NCE": 1, "lambda_GAN": 1, "lambda_MS_neg": 1,
                  "flip_equivariance": False, "num_patches": 64}}},
        Phase.TRAIN)
    outputs, losses = _run_one_step(algo, cfg, ["real_A", "real_B"])
    assert "N" in losses


def test_dclgan_step():
    cfg = _base_config({"loss_criterionGAN": "LSGANLoss",
                        "loss_criterionNCE": "PatchNCELoss",
                        "loss_criterionCycle": "L1Loss",
                        "loss_criterionIdt": "L1Loss"})
    algo = define_model({**cfg, "General": {
        **cfg["General"],
        "model": {"name": "DCLGAN",
                  "netG_A_config": {"name": "resnetGenerator9"},
                  "netG_B_config": {"name": "resnetGenerator9"},
                  "netD_A_config": {"name": "patchGAN70x70"},
                  "netD_B_config": {"name": "patchGAN70x70"},
                  "netF1_config": {"name": "PatchSamplerF", "use_mlp": True},
                  "netF2_config": {"name": "PatchSamplerF", "use_mlp": True},
                  "nce_layers": "0,4,8", "lambda_A": 10, "lambda_B": 10,
                  "lambda_idt": 0.5, "lambda_NCE": 2, "lambda_GAN": 1,
                  "num_patches": 64, "pool_size": 50}}}, Phase.TRAIN)
    outputs, losses = _run_one_step(algo, cfg,
                                    ["real_A", "real_B", "background"])
    assert "NCE1" in losses and "NCE2" in losses


def test_nice_gan_step():
    # NICE-GAN's deep global discriminator head needs >=128px inputs
    # (the reference runs it at 304²; at 64² the logit map is empty)
    res = 128
    cfg = _base_config({"loss_ad": "MSELoss", "loss_cycle": "L1Loss"})
    gen = {"name": "NiceResnetGenerator", "input_nc": 1, "output_nc": 1,
           "ngf": 64, "n_blocks": 2, "img_size": res, "light": True}
    dis = {"name": "NiceDiscriminator", "input_nc": 1, "ndf": 64,
           "n_layers": 7}
    algo = define_model({**cfg, "General": {
        **cfg["General"],
        "model": {"name": "NiceGAN", "gen2B_config": dict(gen),
                  "gen2A_config": dict(gen), "disA_config": dict(dis),
                  "disB_config": dict(dis), "adv_weight": 1,
                  "cycle_weight": 10, "recon_weight": 1}}}, Phase.TRAIN)
    rng = np.random.default_rng(0)
    batch = _batch(["real_A", "real_B", "background"], rng, res)
    batch["real_A_path"] = ["a"] * 2
    batch["real_B_path"] = ["b"] * 2
    init = dict(batch)
    init["image"] = init["real_A"]
    algo.initialize_model_and_optimizer(init, cfg, Args(), phase=Phase.TRAIN)
    before = jax.tree.map(lambda x: np.asarray(x).copy(), algo.params)
    outputs, losses = algo.perform_training_step(
        batch, {"prediction": None, "label": None})
    assert all(np.isfinite(v) for v in losses.values()), losses
    assert _params_changed(before, algo.params)
    assert "cycle_A" in losses


def test_gan_seg_training_step_updates_all_three():
    cfg = _base_config({"loss_dg": "LSGANLoss", "loss_s": "DiceBCELoss"})
    algo = GanSegAlgorithm(
        config=cfg, phase=Phase.TRAIN,
        model_g={"name": "resnetGenerator9"},
        model_d={"name": "patchGAN70x70"},
        model_s={"name": "DynUNet", "spatial_dims": 2, "in_channels": 1,
                 "out_channels": 1, "kernel_size": [3, 3, 3, 3, 3],
                 "strides": [1, 2, 2, 2, 1],
                 "upsample_kernel_size": [1, 2, 2, 2, 1]},
        compute_identity=False, compute_identity_seg=True,
        upshape=(RES, RES))
    rng = np.random.default_rng(1)
    batch = _batch(["real_A", "real_B", "real_A_seg"], rng)
    batch["real_A_path"] = ["a"] * 2
    batch["real_B_path"] = ["b"] * 2
    init = dict(batch)
    algo.initialize_model_and_optimizer(init, cfg, Args(), phase=Phase.TRAIN)
    before = jax.tree.map(lambda x: np.asarray(x).copy(), algo.params)
    outputs, losses = algo.perform_training_step(batch, _post())
    assert all(np.isfinite(v) for v in losses.values())
    for net in ("generator", "discriminator", "segmentor"):
        assert _params_changed(before[net], algo.params[net]), net


def test_gan_seg_inference_phase_needs_no_losses_or_optimizers(tmp_path):
    """test.py/validate.py construct GanSegAlgorithm without Train losses or
    optimizers; _build_steps must still provide the eval steps (regression:
    it referenced self.dg_loss / self.opt unconditionally)."""
    from octa_tpu.io.checkpoints import save_checkpoint

    cfg = _base_config({"loss_dg": "LSGANLoss", "loss_s": "DiceBCELoss"})
    cfg["General"]["inference"] = "G"
    cfg["Output"] = {"save_dir": str(tmp_path)}

    # fabricate a generator checkpoint for the inference load path
    train_algo = GanSegAlgorithm(
        config=cfg, phase=Phase.TRAIN,
        model_g={"name": "resnetGenerator9"},
        model_d={"name": "patchGAN70x70"},
        model_s={"name": "DynUNet", "spatial_dims": 2, "in_channels": 1,
                 "out_channels": 1, "kernel_size": [3, 3, 3, 3, 3],
                 "strides": [1, 2, 2, 2, 1],
                 "upsample_kernel_size": [1, 2, 2, 2, 1]},
        compute_identity=False, compute_identity_seg=True,
        upshape=(RES, RES))
    rng = np.random.default_rng(3)
    batch = _batch(["real_A", "real_B", "real_A_seg"], rng)
    train_algo.initialize_model_and_optimizer(dict(batch), cfg, Args(),
                                              phase=Phase.TRAIN)
    ckdir = tmp_path / "checkpoints"
    ckdir.mkdir()
    save_checkpoint(str(ckdir / "latest_generator_model.ckpt"),
                    {"model": train_algo.params["generator"], "epoch": 1})

    algo = GanSegAlgorithm(
        config=cfg, phase=Phase.TEST,
        model_g={"name": "resnetGenerator9"},
        model_d={"name": "patchGAN70x70"},
        model_s={"name": "DynUNet", "spatial_dims": 2, "in_channels": 1,
                 "out_channels": 1, "kernel_size": [3, 3, 3, 3, 3],
                 "strides": [1, 2, 2, 2, 1],
                 "upsample_kernel_size": [1, 2, 2, 2, 1]},
        compute_identity=False, compute_identity_seg=True,
        upshape=(RES, RES))
    algo.initialize_model_and_optimizer(dict(batch), cfg, Args(),
                                        phase=Phase.TEST)
    # test.py renames the first non-path input key to "image"
    # (reference test.py:63-64,81)
    batch["image"] = batch["real_A"]
    outputs, losses = algo.inference(batch, _post())
    assert losses == {}
    pred = np.asarray(outputs["prediction"])
    assert pred.ndim == 4 and np.isfinite(pred).all()
