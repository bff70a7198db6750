"""Data pipeline tests on the bundled reference dataset (500 graphs/images)."""
import numpy as np
import pytest

from octa_tpu.data.dataset import (
    DataLoader,
    collate,
    get_dataset,
    get_post_transformation,
    natsorted,
)
from octa_tpu.utils.enums import Phase

DATA = "/root/reference/datasets"


def _seg_config(res=64, batch=2):
    return {
        "General": {"task": "ves-seg", "seed": 11, "amp": False},
        "Train": {
            "batch_size": batch,
            "data": {
                "image": {"files": f"{DATA}/vessel_graphs/*.csv"},
                "label": {"files": f"{DATA}/vessel_graphs/*.csv"},
            },
            "data_augmentation": [
                {"name": "LoadGraphAndFilterByRandomRadiusd",
                 "keys": ["image", "label"],
                 "image_resolutions": [[res, res], [res, res]],
                 "min_radius": [0, 0.0033], "max_dropout_prob": 0.02},
                {"name": "ScaleIntensityd", "keys": ["image", "label"],
                 "minv": 0, "maxv": 1},
                {"name": "EnsureChannelFirstd", "keys": ["image", "label"],
                 "strict_check": False, "channel_dim": "no_channel"},
                {"name": "RandFlipd", "keys": ["image", "label"], "prob": 0.5,
                 "spatial_axis": [0, 1]},
                {"name": "RandRotate90d", "keys": ["image", "label"],
                 "prob": 0.75},
                {"name": "RandRotated", "keys": ["image", "label"], "prob": 1,
                 "range_x": 0.17453292519943295, "padding_mode": "zeros"},
                {"name": "AsDiscreted", "keys": ["label"], "threshold": 0.1},
                {"name": "CastToTyped", "keys": ["image", "label"],
                 "dtype": "dtype"},
            ],
            "post_processing": {
                "prediction": [
                    {"name": "Activations", "sigmoid": True},
                    {"name": "AsDiscrete", "threshold": 0.5},
                    {"name": "RemoveSmallObjects", "min_size": 16},
                ],
                "label": [{"name": "CastToType", "dtype": "uint8"}],
            },
        },
    }


def test_natsorted():
    assert natsorted(["x10.png", "x2.png", "x1.png"]) == \
        ["x1.png", "x2.png", "x10.png"]


def test_seg_dataset_end_to_end():
    cfg = _seg_config()
    loader = get_dataset(cfg, Phase.TRAIN)
    batch = next(iter(loader))
    img = np.asarray(batch["image"], np.float32)
    lab = np.asarray(batch["label"], np.float32)
    assert img.shape == (2, 1, 64, 64)
    assert lab.shape == (2, 1, 64, 64)
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert set(np.unique(lab)).issubset({0.0, 1.0})
    assert lab.sum() > 0  # vessels present
    assert isinstance(batch["image_path"][0], str)


def test_min_radius_label_is_sparser_than_image():
    cfg = _seg_config(res=128)
    cfg["Train"]["data_augmentation"][0]["max_dropout_prob"] = 0
    # disable geometric randomness for a clean comparison
    cfg["Train"]["data_augmentation"] = [
        t for t in cfg["Train"]["data_augmentation"]
        if not t["name"].startswith("Rand")
    ]
    loader = get_dataset(cfg, Phase.TRAIN)
    batch = next(iter(loader))
    img_on = (np.asarray(batch["image"]) > 0.1).mean()
    lab_on = (np.asarray(batch["label"]) > 0.5).mean()
    assert lab_on < img_on  # min_radius=0.0033 drops small vessels


def test_post_transformations():
    cfg = _seg_config()
    post = get_post_transformation(cfg, Phase.TRAIN)
    logits = np.random.default_rng(0).normal(size=(1, 32, 32)).astype(np.float32)
    pred = post["prediction"](logits)
    assert set(np.unique(np.asarray(pred))).issubset({0.0, 1.0})
    lab = post["label"](np.ones((1, 8, 8), np.float32))
    assert np.asarray(lab).dtype == np.uint8


def test_gan_dataset_pairing():
    cfg = {
        "General": {"task": "gan-ves-seg", "seed": 3, "amp": False},
        "Train": {
            "batch_size": 2,
            "data": {
                "real_A": {"files": f"{DATA}/vessel_graphs/*.csv"},
                "real_A_seg": {"files": f"{DATA}/vessel_graphs/*.csv"},
                "real_B": {"files": f"{DATA}/images/*.png"},
                "background": {"files": f"{DATA}/background_images/*.png"},
            },
            "data_augmentation": [
                {"name": "LoadImaged", "keys": ["real_B", "background"],
                 "image_only": True},
                {"name": "ToGrayScaled", "keys": ["real_B"]},
                {"name": "LoadGraphAndFilterByRandomRadiusd",
                 "keys": ["real_A", "real_A_seg"],
                 "image_resolutions": [[64, 64], [128, 128]],
                 "min_radius": [0, 0], "max_dropout_prob": 0.02},
                {"name": "EnsureChannelFirstd",
                 "keys": ["real_A", "real_B", "real_A_seg", "background"],
                 "strict_check": False, "channel_dim": "no_channel"},
                {"name": "Resized", "keys": ["background", "real_B"],
                 "spatial_size": [64, 64], "mode": "bilinear"},
                {"name": "ScaleIntensityd",
                 "keys": ["real_A", "real_B", "real_A_seg", "background"],
                 "minv": 0, "maxv": 1},
                {"name": "AsDiscreted", "keys": ["real_A_seg"],
                 "threshold": 0.1},
                {"name": "AddRandomBackgroundNoised", "keys": ["real_A"]},
                {"name": "CastToTyped",
                 "keys": ["real_A", "real_A_seg", "real_B"],
                 "dtype": "dtype"},
            ],
            "post_processing": {"prediction": [], "label": None},
        },
    }
    loader = get_dataset(cfg, Phase.TRAIN)
    batch = next(iter(loader))
    assert np.asarray(batch["real_A"]).shape == (2, 1, 64, 64)
    assert np.asarray(batch["real_A_seg"]).shape == (2, 1, 128, 128)
    assert np.asarray(batch["real_B"]).shape == (2, 1, 64, 64)
    assert "background" not in batch  # consumed by AddRandomBackgroundNoised
    # background noise raised the floor of real_A
    ra = np.asarray(batch["real_A"], np.float32)
    assert (ra > 0).mean() > 0.5


def test_split_file(tmp_path):
    split = tmp_path / "split.txt"
    split.write_text("0\n1\n2\n")
    cfg = _seg_config()
    cfg["Train"]["data"]["image"]["split"] = str(split)
    cfg["Train"]["data"]["label"]["split"] = str(split)
    loader = get_dataset(cfg, Phase.TRAIN)
    assert len(loader.dataset) == 3


def test_unsupported_transform_fails_with_clear_message():
    """The reference dispatches all of monai.transforms via globals()
    (``data_transforms.py:587-611``); this rebuild covers the config corpus
    and must fail loudly (not at first use) for anything else."""
    import pytest

    from octa_tpu.data.transforms import get_data_augmentations

    with pytest.raises(KeyError) as ei:
        get_data_augmentations(
            [{"name": "RandGaussianSharpend", "keys": ["image"]}], seed=0)
    msg = str(ei.value)
    assert "RandGaussianSharpend" in msg and "not implemented" in msg
    assert "LoadImaged" in msg  # lists the supported set
