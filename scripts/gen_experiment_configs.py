#!/usr/bin/env python
"""Generate the paper-experiment config corpus (configs/experiment_configs/).

The reference ships 47 experiment configs (reference
``configs/experiment_configs/*.yml``) covering every paper experiment:
per-dataset segmentation variants (OCTA-500 / ROSE-1 / Giarratano /
OCTA-Cairo / OCTA-SH), the six GAN methods, Menten-baseline ablations,
noise-model delta ablations, joint GAN+seg training, and 3D reconstruction.
This script composes our equivalents from the top-level base configs instead
of hand-maintaining 47 near-duplicates: each experiment = base config +
declarative patch list. Re-run after changing a base config.

Dataset conventions (see the generated README): external evaluation datasets
are expected under ``datasets/<name>/`` with ``images/``, ``labels/`` and
``val_<fold>.txt`` split files.
"""
from __future__ import annotations

import copy
import os

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "configs", "experiment_configs")


def load(name: str) -> dict:
    with open(os.path.join(REPO, "configs", name)) as f:
        return yaml.safe_load(f)


def find_transform(cfg: dict, phase: str, name: str) -> dict | None:
    for t in cfg.get(phase, {}).get("data_augmentation", []):
        if t.get("name") == name:
            return t
    return None


def drop_transform(cfg: dict, phase: str, name: str) -> None:
    aug = cfg.get(phase, {}).get("data_augmentation", [])
    cfg[phase]["data_augmentation"] = [t for t in aug if t.get("name") != name]


def set_post(cfg: dict, phase: str, tname: str, key: str, value) -> None:
    for t in cfg.get(phase, {}).get("post_processing", {}).get("prediction", []):
        if t.get("name") == tname:
            t[key] = value


# ---------------------------------------------------------------------------
# Dataset table (reference per-dataset settings; see e.g.
# config_ves_seg-S_RA_{OCTA-500,ROSE-1,Giarratano}.yml diffs)
# ---------------------------------------------------------------------------

DATASETS = {
    "OCTA-500": dict(
        min_radius=[0, 0.0033], label_threshold=0.1, val_min_size=160,
        images="datasets/OCTA-500/images/*.png",
        labels="datasets/OCTA-500/labels/*.png",
        split="datasets/OCTA-500/val_", crop=None,
    ),
    "ROSE-1": dict(
        min_radius=[0, 0.0015], label_threshold=0.001, val_min_size=160,
        images="datasets/ROSE-1/images/*.png",
        labels="datasets/ROSE-1/labels/*.png",
        split="datasets/ROSE-1/val_", crop=None,
    ),
    "Giarratano": dict(
        min_radius=[0, 0], label_threshold=0.1, val_min_size=16,
        images="datasets/Giarratano/original_images/*.png",
        labels="datasets/Giarratano/segmented_images/*.png",
        split="datasets/Giarratano/val_", crop=0.2965,
    ),
    # unlabeled qualitative sets (S_GAN only): evaluation = visual test split
    "OCTA-Cairo": dict(
        min_radius=[0, 0], label_threshold=0.1, val_min_size=128,
        images="datasets/OCTA-Cairo/**/*.png",
        labels="datasets/OCTA-Cairo/**/*.png", split=None, crop=None,
    ),
    "OCTA-SH": dict(
        min_radius=[0, 0.0033], label_threshold=0.1, val_min_size=128,
        images="datasets/OCTA-SH/**/*.png",
        labels="datasets/OCTA-SH/**/*.png", split=None, crop=None,
    ),
}


def apply_dataset(cfg: dict, ds: str) -> dict:
    """Point Validation/Test at a real dataset and set per-dataset knobs."""
    d = DATASETS[ds]
    t = find_transform(cfg, "Train", "LoadGraphAndFilterByRandomRadiusd")
    if t is not None:
        t["min_radius"] = d["min_radius"]
    for phase in ("Train", "Validation"):
        for tr in cfg.get(phase, {}).get("data_augmentation", []):
            if tr.get("name") == "AsDiscreted" and "label" in tr.get("keys", []):
                tr["threshold"] = d["label_threshold"]
    if d["crop"] is not None:
        aug = cfg["Train"]["data_augmentation"]
        idx = next((i for i, tr in enumerate(aug)
                    if tr.get("name") == "AsDiscreted"), len(aug))
        aug.insert(idx, {
            "name": "RandCropOrPadd", "keys": ["image", "label"], "prob": 1,
            "min_factor": d["crop"], "max_factor": d["crop"],
        })
    for phase in ("Validation", "Test"):
        if phase not in cfg:
            continue
        data = cfg[phase].setdefault("data", {})
        if "image" in data:
            data["image"]["files"] = d["images"]
            if d["split"]:
                data["image"]["split"] = d["split"]
            else:
                data["image"].pop("split", None)
        if "label" in data and phase == "Validation":
            data["label"]["files"] = d["labels"]
            if d["split"]:
                data["label"]["split"] = d["split"]
            else:
                data["label"].pop("split", None)
        elif "label" in data:
            data.pop("label", None)
    set_post(cfg, "Validation", "RemoveSmallObjects", "min_size",
             d["val_min_size"])
    return cfg


def set_save_dir(cfg: dict, name: str) -> dict:
    cfg.setdefault("Output", {})["save_dir"] = f"./results/{name}"
    return cfg


def use_menten_dataset(cfg: dict) -> dict:
    """Train on pre-rendered Menten/Schneider synthetic PNGs instead of our
    vessel graphs (reference config_ves_seg-S_Menten_*.yml)."""
    cfg["Train"]["data"]["image"]["files"] = \
        "datasets/Synthetic_OCTA_Schneider/img/*.png"
    cfg["Train"]["data"]["label"]["files"] = \
        "datasets/Synthetic_OCTA_Schneider/gt/*.png"
    aug = cfg["Train"]["data_augmentation"]
    drop_transform(cfg, "Train", "LoadGraphAndFilterByRandomRadiusd")
    loadimg = find_transform(cfg, "Train", "LoadImaged")
    if loadimg is not None:
        loadimg["keys"] = sorted(set(loadimg["keys"]) | {"image", "label"})
    # pre-rendered images are 2D PNGs: need channel + resize like validation
    idx = next(i for i, t in enumerate(aug)
               if t.get("name") == "EnsureChannelFirstd")
    aug.insert(idx + 1, {"name": "Resized", "keys": ["label"],
                         "spatial_size": [1216, 1216], "mode": "bilinear"})
    return cfg


def menten_augmentation(cfg: dict) -> dict:
    """Replace the noise model with the MICCAI-2022 Menten augmentations."""
    aug = cfg["Train"]["data_augmentation"]
    for i, t in enumerate(aug):
        if t.get("name") == "NoiseModeld":
            aug[i] = {"name": "MentenAugmentationd", "img_key": "image",
                      "gt_key": "label"}
            break
    drop_transform(cfg, "Train", "RandomDecreaseResolutiond")
    return cfg


def gan_transform(cfg: dict, method_model: dict, model_path: str) -> dict:
    """Replace the noise model with a frozen GAN generator transform
    (reference config_ves_seg-S_{GAN,cut,...}_*.yml)."""
    t = find_transform(cfg, "Train", "LoadGraphAndFilterByRandomRadiusd")
    if t is not None:
        t["max_dropout_prob"] = 0.02
    aug = cfg["Train"]["data_augmentation"]
    out = []
    for tr in aug:
        if tr.get("name") == "NoiseModeld":
            out.extend([
                {"name": "RandFlipd", "keys": ["background"], "prob": 0.5,
                 "spatial_axis": [0, 1]},
                {"name": "RandRotate90d", "keys": ["background"],
                 "prob": 0.75},
                {"name": "AddRandomBackgroundNoised", "keys": ["image"]},
                {"name": "ImageToImageTranslationd", "keys": ["image"],
                 "model_path": model_path, "model": method_model},
            ])
        else:
            out.append(tr)
    cfg["Train"]["data_augmentation"] = out
    return cfg


RESNET_G = {"name": "resnetGenerator9"}


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    generated: dict[str, dict] = {}

    base_ra = load("config_ves_seg-S_RA.yml")
    base_aa = load("config_ves_seg-S_AA.yml")
    base_sup = load("config_ves_seg_supervised.yml")
    base_menten = load("config_ves_seg_menten.yml")

    # -- top-level mirrors kept by the reference inside experiment_configs --
    for src in ("config_gan_ves_seg.yml", "config_cut.yml",
                "config_cycle_gan.yml", "config_dclgan.yml",
                "config_negcut.yml", "config_nice_gan.yml",
                "config_oof.yml", "config_3d_recon_supervised.yml",
                "config_ves_seg-S_AA.yml", "config_ves_seg-S_RA.yml",
                "config_ves_seg-S_GAN.yml"):
        name = os.path.splitext(src)[0]
        generated[name] = load(src)

    generated["config_ves_seg-supervised"] = copy.deepcopy(base_sup)
    generated["config_ves_seg-supervised_Giarratano"] = apply_dataset(
        copy.deepcopy(base_sup), "Giarratano")

    # -- joint GAN+seg on Menten's (rescaled) vessel graphs --
    gm = copy.deepcopy(load("config_gan_ves_seg.yml"))
    for key in ("real_A", "real_A_seg"):
        gm["Train"]["data"][key]["files"] = \
            "datasets/menten_graphs_scaled/*.csv"
    gm["Train"]["epochs"] = 50
    generated["config_gan_ves_seg_menten"] = gm

    # -- S_RA per dataset + noise-model delta ablations (OCTA-500) --
    for ds in ("OCTA-500", "ROSE-1", "Giarratano"):
        generated[f"config_ves_seg-S_RA_{ds}"] = apply_dataset(
            copy.deepcopy(base_ra), ds)
    for tag, (spk, gam, decres) in {
        "delta": (0, 0.0001, False),
        "delta_N": (0.7, 0.0001, False),
        "delta_N_gamma": (0.7, 0.3, False),
    }.items():
        c = apply_dataset(copy.deepcopy(base_ra), "OCTA-500")
        nm = find_transform(c, "Train", "NoiseModeld")
        nm["lambda_speckle"] = spk
        nm["lambda_gamma"] = gam
        if not decres:
            drop_transform(c, "Train", "RandomDecreaseResolutiond")
        generated[f"config_ves_seg-S_RA_{tag}_OCTA-500"] = c

    # -- S_AA (adversarial noise training) per dataset --
    for ds in ("OCTA-500", "ROSE-1", "Giarratano"):
        generated[f"config_ves_seg-S_AA_{ds}"] = apply_dataset(
            copy.deepcopy(base_aa), ds)

    # -- S_Menten: pre-rendered Menten data, no contrast adaptation --
    for ds in ("OCTA-500", "ROSE-1", "Giarratano"):
        c = use_menten_dataset(copy.deepcopy(base_ra))
        drop_transform(c, "Train", "NoiseModeld")
        generated[f"config_ves_seg-S_Menten_{ds}"] = apply_dataset(c, ds)

    # -- S_Menten_aug: our graphs + Menten's augmentation pipeline --
    for ds in ("OCTA-500", "ROSE-1", "Giarratano"):
        c = menten_augmentation(copy.deepcopy(base_ra))
        generated[f"config_ves_seg-S_Menten_aug_{ds}"] = apply_dataset(c, ds)

    # -- Menten_Menten_aug: Menten data + Menten augs (their full baseline) --
    for ds in ("OCTA-500", "ROSE-1", "Giarratano"):
        c = menten_augmentation(copy.deepcopy(base_menten)) \
            if find_transform(base_menten, "Train", "NoiseModeld") \
            else copy.deepcopy(base_menten)
        generated[f"config_ves_seg-Menten_Menten_aug_{ds}"] = apply_dataset(
            c, ds)

    # -- Menten_GAN / Menten_RA: Menten data + our contrast adaptation --
    gan_path = "results/gan-ves-seg/checkpoints/50_G_model"
    for ds in ("OCTA-500", "ROSE-1", "Giarratano"):
        c = gan_transform(use_menten_dataset(copy.deepcopy(base_ra)),
                          RESNET_G, gan_path)
        drop_transform(c, "Train", "NoiseModeld")
        generated[f"config_ves_seg-Menten_GAN_{ds}"] = apply_dataset(c, ds)
    generated["config_ves_seg-Menten_RA_OCTA-500"] = apply_dataset(
        use_menten_dataset(copy.deepcopy(base_ra)), "OCTA-500")

    # -- S_GAN per dataset (incl. the two qualitative sets) --
    for ds in ("OCTA-500", "ROSE-1", "Giarratano", "OCTA-Cairo", "OCTA-SH"):
        c = gan_transform(copy.deepcopy(base_ra), RESNET_G, gan_path)
        c = apply_dataset(c, ds)
        if ds in ("OCTA-Cairo", "OCTA-SH"):
            c["Train"]["epochs"] = 40
        generated[f"config_ves_seg-S_GAN_{ds}"] = c

    # -- S_<gan-method> on OCTA-500: contrast adaptation by each GAN family --
    method_models = {
        "cycle_gan": ({"name": "resnetGenerator9"},
                      "results/cycle-gan/checkpoints/100_G_A_model"),
        "cut": ({"name": "resnetGenerator9"},
                "results/cut/checkpoints/100_G_model"),
        "negcut": ({"name": "resnetGenerator9"},
                   "results/negcut/checkpoints/100_G_model"),
        "dclgan": ({"name": "resnetGenerator9"},
                   "results/dclgan/checkpoints/100_G_A_model"),
        "nice_gan": ({"name": "NiceResnetGenerator", "ngf": 64},
                     "results/nice-gan/checkpoints/100_G_A_model"),
    }
    for method, (model, path) in method_models.items():
        c = gan_transform(copy.deepcopy(base_ra), model, path)
        generated[f"config_ves_seg-S_{method}_OCTA-500"] = apply_dataset(
            c, "OCTA-500")

    for name, cfg in generated.items():
        set_save_dir(cfg, name.replace("config_", "").replace("_", "-", 1))
        with open(os.path.join(OUT, f"{name}.yml"), "w") as f:
            yaml.safe_dump(cfg, f, sort_keys=False)
    print(f"wrote {len(generated)} configs to {OUT}")


if __name__ == "__main__":
    main()
