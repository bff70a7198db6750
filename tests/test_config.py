import yaml

from octa_tpu.utils import Phase, Task, apply_cli_overrides, parse_cli_overrides


def test_phase_equals_string():
    assert Phase.TRAIN == "Train"
    assert Phase.VALIDATION == "Validation"
    assert Phase.TEST == "Test"
    assert Task.VESSEL_SEGMENTATION == "ves-seg"
    assert Task.GAN_VESSEL_SEGMENTATION == "gan-ves-seg"


def test_phase_indexes_plain_dict():
    cfg = yaml.safe_load("Train:\n  lr: 0.001\nValidation:\n  batch_size: 2\n")
    assert cfg[Phase.TRAIN]["lr"] == 0.001
    assert cfg[Phase.VALIDATION]["batch_size"] == 2
    assert Phase.TRAIN in cfg
    # str(Phase) usable as prefix like the reference MetricsManager
    assert f"{Phase.TRAIN}_DSC" == "Train_DSC"


def test_parse_cli_overrides_forms():
    toks = ["--Test.save_dir", "/out", "--Output.save_to_disk=false", "--General.amp"]
    parsed = dict(parse_cli_overrides(toks))
    assert parsed["Test.save_dir"] == "/out"
    assert parsed["Output.save_to_disk"] == "false"
    assert parsed["General.amp"] == "true"


def test_apply_overrides_nested_and_typed():
    cfg = {"General": {"amp": True}, "Train": {"lr": 0.1}}
    apply_cli_overrides(
        cfg,
        [
            "--Train.lr", "0.0002",
            "--Train.data.real_A.files", "/x/*.csv",
            "--Output.save_to_disk=false",
            "--General.seed", "42",
            "--plainflag", "ignored",  # non-dotted: untouched
        ],
    )
    assert cfg["Train"]["lr"] == 0.0002
    assert cfg["Train"]["data"]["real_A"]["files"] == "/x/*.csv"
    assert cfg["Output"]["save_to_disk"] is False
    assert cfg["General"]["seed"] == 42
    assert "plainflag" not in cfg


def test_reference_config_corpus_parses():
    """Every YAML experiment config shipped with the reference must load."""
    import glob

    # Two upstream files contain malformed YAML and fail in the reference too.
    known_bad = {
        "config_ves_seg-Menten_Menten_aug_OCTA-500.yml",
        "config_ves_seg-S_AA.yml",
    }
    paths = [
        p
        for p in glob.glob("/root/reference/configs/**/*.yml", recursive=True)
        if p.rsplit("/", 1)[-1] not in known_bad
    ]
    assert len(paths) > 40
    for p in paths:
        with open(p) as f:
            cfg = yaml.safe_load(f)
        assert isinstance(cfg, dict)
        assert "General" in cfg or "Greenhouse" in cfg
