"""Every shipped config must parse, resolve its transforms, and construct its
model/algorithm object."""
import glob
import os

import pytest
import yaml

from octa_tpu.data.transforms import get_data_augmentations
from octa_tpu.train.algorithms import define_model
from octa_tpu.utils.enums import Phase

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(
    glob.glob(os.path.join(REPO, "configs", "config_*.yml"))
    + glob.glob(os.path.join(REPO, "configs", "experiment_configs",
                             "config_*.yml"))
)


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_builds(path):
    with open(path) as f:
        cfg = yaml.safe_load(f)
    assert "General" in cfg
    for phase in (Phase.TRAIN, Phase.VALIDATION, Phase.TEST):
        aug = cfg.get(phase, {}).get("data_augmentation") or []
        if any(t.get("name") == "ImageToImageTranslationd" for t in aug):
            continue  # needs a trained checkpoint on disk
        if phase in cfg and cfg[phase].get("data_augmentation"):
            transforms = get_data_augmentations(
                cfg[phase]["data_augmentation"], seed=0)
            assert len(transforms) == len(cfg[phase]["data_augmentation"])
    model = define_model(cfg, Phase.TRAIN)
    assert model is not None


def test_vessel_gen_config_builds():
    from octa_tpu.sim.greenhouse import Greenhouse

    with open(os.path.join(REPO, "configs", "vessel_graph_gen.yml")) as f:
        cfg = yaml.safe_load(f)
    g = Greenhouse(cfg["Greenhouse"])
    assert len(g.modes) == 2
    assert g.modes[0].I == 100 and g.modes[1].I == 150


DOCKER_CONFIGS = sorted(
    glob.glob(os.path.join(REPO, "docker", "trained_models", "*", "config.yml")))


@pytest.mark.parametrize(
    "path", DOCKER_CONFIGS,
    ids=[os.path.basename(os.path.dirname(p)) for p in DOCKER_CONFIGS])
def test_docker_config_builds(path):
    with open(path) as f:
        cfg = yaml.safe_load(f)
    transforms = get_data_augmentations(
        cfg["Test"]["data_augmentation"], seed=0)
    assert transforms
    model = define_model(cfg, Phase.TEST)
    assert model is not None


def test_visualizer_tensorboard(tmp_path):
    from octa_tpu.io.visualizer import Visualizer

    cfg = {"Output": {"save_dir": str(tmp_path), "save_to_disk": True,
                      "save_to_tensorboard": True}}
    viz = Visualizer(cfg)
    viz.plot_losses_and_metrics({"train": {"loss": 0.5, "DSC": 0.8}}, 0)
    viz.plot_losses_and_metrics({"train": {"loss": 0.4, "DSC": 0.85}}, 1)
    tb_dir = os.path.join(viz.save_dir, "tensorboard")
    assert os.path.isdir(tb_dir) and os.listdir(tb_dir)
