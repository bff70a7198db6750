"""Multi-step GAN training dynamics at tiny resolution (VERDICT r1 #6).

One-step tests (test_gan_algorithms.py) prove the jitted steps run; these
prove the *training dynamics* work over 30 steps on real bundled data:
discriminator losses depart from their initialization plateau, NCE
decreases, generator outputs do not collapse to a constant, and the
host-side stateful machinery (ImagePool replay buffer, NEGCUT's EMA netF_
mirror) actually mutates — exactly the places where a JAX rewrite of
torch GAN training (requires_grad toggles -> stop_gradient, AMP -> bf16,
stateful pools) could silently diverge (reference
``models/cycle_gan.py:146-248``, ``models/cut.py:120-224``,
``models/gan_seg_model.py:109-173``).
"""
import glob

import numpy as np
import pytest
from PIL import Image

import jax

from octa_tpu.train.algorithms import GanSegAlgorithm, define_model
from octa_tpu.utils.enums import Phase

RES = 64
STEPS = 30


class Args:
    start_epoch = 0
    epoch = "latest"


def _base_config(extra_train):
    return {
        "General": {"task": "gan-ves-seg", "seed": 0, "amp": False,
                    "inference": None},
        "Train": {"epochs": 2, "epochs_decay": 0, "batch_size": 2,
                  "lr": 2e-4, **extra_train},
        "Output": {"save_dir": "/tmp/gan-dyn-test", "save_to_disk": False},
    }


@pytest.fixture(scope="module")
def real_batches():
    """Four batches of real bundled data downsampled to RES: real_A =
    binary vessel labels (synthetic domain), real_B = grayscale images
    (target domain) — structured data so D/NCE have real signal."""
    imgs = sorted(glob.glob("datasets/images/*.png"))[:8]
    labs = sorted(glob.glob("datasets/labels/*.png"))[:8]

    def load(path, binarize):
        a = Image.open(path).convert("L").resize((RES, RES), Image.BILINEAR)
        a = np.asarray(a, np.float32) / 255.0
        return (a > 0.1).astype(np.float32) if binarize else a

    batches = []
    for b in range(4):
        A = np.stack([load(labs[2 * b + i], True) for i in range(2)])
        B = np.stack([load(imgs[2 * b + i], False) for i in range(2)])
        batches.append({
            "real_A": A[:, None], "real_B": B[:, None],
            "real_A_seg": A[:, None], "background": B[:, None] * 0.3,
            "real_A_path": ["a"] * 2, "real_B_path": ["b"] * 2,
        })
    return batches


def _run_steps(algo, batches, n=STEPS):
    post = {"prediction": None, "label": None}
    traj = []
    for i in range(n):
        _, losses = algo.perform_training_step(batches[i % len(batches)], post)
        losses = {k: float(v) for k, v in losses.items()}
        assert all(np.isfinite(v) for v in losses.values()), (i, losses)
        traj.append(losses)
    return traj


def _series(traj, key):
    return np.array([t[key] for t in traj])


def test_cycle_gan_30step_dynamics(real_batches):
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
                  "pool_size": 16}}}, Phase.TRAIN)
    init = dict(real_batches[0])
    init["image"] = init["real_A"]
    algo.initialize_model_and_optimizer(init, cfg, Args(), Phase.TRAIN)
    traj = _run_steps(algo, real_batches)

    # discriminators learn: D loss drops from its init plateau
    for k in ("D_A", "D_B"):
        d = _series(traj, k)
        assert d[-5:].mean() < d[:3].mean(), (k, d[:3], d[-5:])
    # cycle reconstruction improves
    cyc = _series(traj, "cycle_A") + _series(traj, "cycle_B")
    assert cyc[-5:].mean() < cyc[:3].mean()
    # ImagePool replay buffer filled up and is actually being used
    assert len(algo.fake_A_pool.images) == 16
    assert len(algo.fake_B_pool.images) == 16
    # no generator collapse: translated output retains spatial structure
    import jax.numpy as jnp
    fake_B = algo.networks["netG_A"].apply(
        {"params": algo.params["netG_A"]},
        jnp.asarray(real_batches[0]["real_A"].transpose(0, 2, 3, 1)))
    assert float(jnp.std(fake_B)) > 1e-2


def test_cut_30step_dynamics(real_batches):
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
    init = dict(real_batches[0])
    init["image"] = init["real_A"]
    algo.initialize_model_and_optimizer(init, cfg, Args(), Phase.TRAIN)
    before_F = jax.tree.map(lambda x: np.asarray(x).copy(),
                            algo.params["netF"])
    traj = _run_steps(algo, real_batches)

    # PatchNCE head trains and the NCE loss decreases
    nce = _series(traj, "loss_NCE")
    assert nce[-5:].mean() < nce[:3].mean(), (nce[:3], nce[-5:])
    d = _series(traj, "D_real") + _series(traj, "D_fake")
    assert d[-5:].mean() < d[:3].mean()
    changed = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        algo.params["netF"], before_F))
    assert max(changed) > 1e-6  # the F head actually trained


def test_gan_seg_30step_dynamics(real_batches):
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
    algo.initialize_model_and_optimizer(dict(real_batches[0]), cfg, Args(),
                                        Phase.TRAIN)
    traj = _run_steps(algo, real_batches)

    # the segmentor learns on translated synthetic data
    s = _series(traj, "S")
    assert s[-5:].mean() < s[:3].mean(), (s[:3], s[-5:])
    # the discriminator moves off its init plateau
    d = _series(traj, "D_real") + _series(traj, "D_fake")
    assert abs(d[-5:].mean() - d[:3].mean()) > 1e-3
    # segmentor prediction has not collapsed to a constant map
    import jax.numpy as jnp
    pred = algo.networks["segmentor"].apply(
        {"params": algo.params["segmentor"]},
        jnp.asarray(real_batches[0]["real_A_seg"].transpose(0, 2, 3, 1)))
    assert float(jnp.std(pred)) > 1e-2


def test_negcut_ema_mirror_mutates(real_batches):
    """NEGCUT's netF_ EMA mirror must track netF (reference
    ``models/negcut.py:233-236``) — 6 steps suffice to see movement."""
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
    init = dict(real_batches[0])
    init["image"] = init["real_A"]
    algo.initialize_model_and_optimizer(init, cfg, Args(), Phase.TRAIN)
    ema0 = jax.tree.map(lambda x: np.asarray(x).copy(), algo.params["netF_"])
    _run_steps(algo, real_batches, n=6)
    moved = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        algo.params["netF_"], ema0))
    assert max(moved) > 1e-7  # EMA mirror is updating
    # and it lags netF (it is an average, not a copy)
    gap = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        algo.params["netF_"], algo.params["netF"]))
    assert max(gap) > 1e-7
