"""End-to-end slice: supervised DynUNet segmentation training on bundled
graphs at small resolution (SURVEY §7.2 step 5)."""
import csv
import os

import numpy as np
import pytest

from octa_tpu.train.engine import train
from octa_tpu.utils.enums import Phase

DATA = "/root/reference/datasets"


class Args:
    start_epoch = 0
    epoch = "latest"
    split = ""
    save_latest = True
    num_workers = 0


def _config(tmp_path, res=64, epochs=2, n_files=6):
    aug = [
        {"name": "LoadGraphAndFilterByRandomRadiusd", "keys": ["image", "label"],
         "image_resolutions": [[res, res], [res, res]],
         "min_radius": [0, 0], "max_dropout_prob": 0},
        {"name": "ScaleIntensityd", "keys": ["image", "label"],
         "minv": 0, "maxv": 1},
        {"name": "EnsureChannelFirstd", "keys": ["image", "label"],
         "strict_check": False, "channel_dim": "no_channel"},
        {"name": "AsDiscreted", "keys": ["label"], "threshold": 0.1},
        {"name": "CastToTyped", "keys": ["image", "label"], "dtype": "dtype"},
    ]
    split = tmp_path / "split.txt"
    split.write_text("\n".join(str(i) for i in range(n_files)))
    post = {
        "prediction": [
            {"name": "Activations", "sigmoid": True},
            {"name": "AsDiscrete", "threshold": 0.5},
        ],
        "label": [{"name": "CastToType", "dtype": "uint8"}],
    }
    return {
        "General": {"task": "ves-seg", "seed": 7, "amp": False,
                    "model": {"name": "DynUNet", "spatial_dims": 2,
                              "in_channels": 1, "out_channels": 1,
                              "kernel_size": [3, 3, 3, 3, 3],
                              "strides": [1, 2, 2, 2, 1],
                              "upsample_kernel_size": [1, 2, 2, 2, 1]}},
        "Train": {
            "data": {
                "image": {"files": f"{DATA}/vessel_graphs/*.csv",
                          "split": str(split)},
                "label": {"files": f"{DATA}/vessel_graphs/*.csv",
                          "split": str(split)},
            },
            "epochs": epochs, "epochs_decay": 1, "val_interval": 1,
            "save_interval": 10, "batch_size": 2, "lr": 1e-3,
            "loss": "DiceBCELoss", "AT": False,
            "data_augmentation": aug, "post_processing": post,
        },
        "Validation": {
            "batch_size": 2,
            "data": {
                "image": {"files": f"{DATA}/vessel_graphs/*.csv",
                          "split": str(split)},
                "label": {"files": f"{DATA}/vessel_graphs/*.csv",
                          "split": str(split)},
            },
            "data_augmentation": aug, "post_processing": post,
        },
        "Test": {
            "batch_size": 1,
            "data": {"image": {"files": f"{DATA}/vessel_graphs/*.csv",
                               "split": str(split)}},
            "data_augmentation": [
                {"name": "LoadGraphAndFilterByRandomRadiusd",
                 "keys": ["image"], "image_resolutions": [[res, res]],
                 "min_radius": [0], "max_dropout_prob": 0},
                {"name": "ScaleIntensityd", "keys": ["image"],
                 "minv": 0, "maxv": 1},
                {"name": "EnsureChannelFirstd", "keys": ["image"],
                 "strict_check": False, "channel_dim": "no_channel"},
                {"name": "CastToTyped", "keys": ["image"], "dtype": "dtype"},
            ],
            "post_processing": post,
        },
        "Output": {"save_dir": str(tmp_path / "results"),
                   "save_to_disk": True, "save_to_tensorboard": False},
    }


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("seg")
    cfg = _config(tmp_path)
    out = train(Args(), cfg)
    return out, cfg, tmp_path


def test_training_artifacts(run_dir):
    out, cfg, _ = run_dir
    assert os.path.exists(os.path.join(out, "config.yml"))
    assert os.path.exists(os.path.join(out, "metrics.csv"))
    assert os.path.exists(os.path.join(out, "loss.png"))
    assert os.path.exists(os.path.join(out, "architecture.txt"))
    ck = os.path.join(out, "checkpoints")
    assert os.path.exists(os.path.join(ck, "latest_model_model.ckpt"))
    assert os.path.exists(os.path.join(ck, "latest_optimizer.ckpt"))
    with open(os.path.join(out, "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    assert "Train_DSC" in rows[0]
    assert "Validation_DSC" in rows[0]
    assert "Validation_ClDice" in rows[0]
    # the loss must decrease over 2 epochs of memorizing 6 samples
    assert float(rows[1]["train_DiceBCELoss"]) < float(rows[0]["train_DiceBCELoss"])


def test_training_learns_something(run_dir):
    out, cfg, _ = run_dir
    with open(os.path.join(out, "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    # after 2 epochs the model should beat trivial DSC
    assert float(rows[-1]["Validation_DSC"]) > 0.2


def test_checkpoint_roundtrip_inference(run_dir):
    out, cfg, tmp_path = run_dir
    from octa_tpu.data.dataset import get_dataset, get_post_transformation
    from octa_tpu.train.algorithms import define_model

    cfg2 = dict(cfg)
    cfg2["Output"] = {"save_dir": out, "save_to_disk": False}

    class A:
        epoch = "latest"
        start_epoch = 0

    loader = get_dataset(cfg2, Phase.TEST)
    post = get_post_transformation(cfg2, Phase.TEST)
    model = define_model(cfg2, Phase.TEST)
    batch = next(iter(loader))
    batch["image"] = batch[[k for k in batch if not k.endswith("_path")][0]]
    model.initialize_model_and_optimizer(batch, cfg2, A(), phase=Phase.TEST)
    outputs, losses = model.inference(batch, post, phase=Phase.TEST)
    pred = np.asarray(outputs["prediction"][0])
    assert pred.shape[-2:] == (64, 64)
    assert losses is None


def test_resume_forks_run_dir(tmp_path):
    """--start_epoch resume: new sibling run dir, carried checkpoints,
    metrics.csv truncated to the resume epoch (reference visualizer.py:38-58).
    """
    import glob as _glob
    import yaml as _yaml

    cfg = _config(tmp_path, res=64, epochs=2)
    run_dir = train(Args(), cfg)
    assert os.path.exists(os.path.join(run_dir, "metrics.csv"))

    with open(os.path.join(run_dir, "config.yml")) as f:
        snap = _yaml.safe_load(f)

    class ResumeArgs(Args):
        start_epoch = 2
        epoch = "latest"

    snap["Train"]["epochs"] = 3
    run_dir2 = train(ResumeArgs(), snap)
    assert run_dir2 != run_dir
    assert os.path.dirname(run_dir2.rstrip("/")) == \
        os.path.dirname(run_dir.rstrip("/"))
    # carried checkpoints + truncated-then-extended metrics
    assert os.path.exists(
        os.path.join(run_dir2, "checkpoints", "latest_model_model.ckpt"))
    with open(os.path.join(run_dir2, "metrics.csv")) as f:
        rows = f.read().strip().splitlines()
    assert len(rows) == 1 + 3  # header + epochs 0,1 carried + epoch 2 new
