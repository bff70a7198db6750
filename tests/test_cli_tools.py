"""Smoke tests for CLI tools: generation, visualization, ROI crop, HPO."""
import os
import subprocess
import sys

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)


def _run(args, cwd=REPO):
    return subprocess.run([sys.executable] + args, cwd=cwd, env=ENV,
                          capture_output=True, text=True, timeout=600)


def test_generate_vessel_graph_cli(tmp_path):
    cfg = {
        "Greenhouse": {
            "SimulationSpace": {"no_voxel_x": 1, "no_voxel_y": 1,
                                "no_voxel_z": 0.0131},
            "d": 0.1, "r": 0.0025, "FAZ_radius_bound": [0.44, 0.04],
            "rotation_radius": 1.05, "FAZ_center": [0.5, 0.5],
            "nerve_center": [10.56, 5.16], "nerve_radius": 0.3,
            "param_scale": 3,
            "modes": [{"name": "SVC", "I": 6, "N": 400, "eps_n": 0.18,
                       "eps_s": 0.135, "eps_k": 0.135, "delta_art": 0.2925,
                       "delta_ven": 0.2925, "gamma_art": 50, "gamma_ven": 50,
                       "phi": 15, "omega": 0.3, "kappa": 2.55,
                       "delta_sigma": 0.02}],
        },
        "output": {"directory": str(tmp_path / "graphs"),
                   "image_scale_factor": 76, "save_trees": True,
                   "save_3D_volumes": None, "save_2D_image": True,
                   "proj_axis": 2, "save_stats": False},
        "Forest": {"type": "stumps", "N_trees": 4,
                   "source_walls": {"x0": True, "x1": True, "y0": True,
                                    "y1": True, "z0": False, "z1": False}},
    }
    cfg_path = tmp_path / "gen.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    r = _run(["generate_vessel_graph.py", "--config_file", str(cfg_path),
              "--num_samples", "2"])
    assert r.returncode == 0, r.stderr[-2000:]
    import glob

    csvs = glob.glob(str(tmp_path / "graphs" / "*" / "*.csv"))
    pngs = glob.glob(str(tmp_path / "graphs" / "*" / "*.png"))
    assert len(csvs) == 2 and len(pngs) == 2
    from octa_tpu.ops.raster import parse_graph_csv

    arrays = parse_graph_csv(csvs[0])
    assert len(arrays["radius"]) > 10


def test_visualize_vessel_graphs_cli(tmp_path):
    src = "/root/reference/datasets/vessel_graphs"
    out = tmp_path / "render"
    r = _run(["visualize_vessel_graphs.py", "--source_dir", src,
              "--out_dir", str(out), "--resolution", "64,64,5",
              "--binarize", "--num_samples", "1"])
    assert r.returncode == 0, r.stderr[-2000:]
    import glob

    assert len(glob.glob(str(out / "*.png"))) == 1


def test_roi_cropping_cli(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    inp = tmp_path / "in"
    inp.mkdir()
    # image with a bright centered ROI
    img = np.zeros((200, 200), np.uint8)
    img[40:160, 40:160] = rng.integers(100, 255, (120, 120))
    Image.fromarray(img).save(inp / "a.png")
    out = tmp_path / "out"
    r = _run(["ROI_cropping.py", "--input_dir", str(inp),
              "--output_dir", str(out), "--roi_size", "100"])
    assert r.returncode == 0, r.stderr[-2000:]
    cropped = np.array(Image.open(out / "a.png"))
    assert cropped.shape == (100, 100)
    assert os.path.exists(out / "problematic.csv")


def test_hpo_harness_finds_optimum():
    from octa_tpu.utils.hpo import Uniform, tune

    def eval_fn(p):
        return {"score": -(p["x"] - 0.3) ** 2}

    best, result, hist = tune({"x": Uniform(0, 1)}, eval_fn, "score",
                              num_samples=60, verbose=False)
    assert abs(best["x"] - 0.3) < 0.05
    assert len(hist) == 60


def test_hpo_successive_halving_truncates_bad_trials():
    """ASHA/HyperBand role of the reference's TuneBOHB
    (``utils/bayesOpt.py:76-115``): bad configs must be stopped at the
    first rung instead of consuming the full budget."""
    from octa_tpu.utils.hpo import Uniform, tune_sha

    budgets_seen = []

    def eval_fn(p, budget, state):
        budgets_seen.append(budget)
        # score improves with budget; resumable state must thread through
        assert state is None or state["b"] < budget
        return {"score": -(p["x"] - 0.3) ** 2 * (1.0 + 1.0 / budget),
                "b": budget}

    best, result, hist = tune_sha(
        {"x": Uniform(0, 1)}, eval_fn, "score", num_samples=27,
        min_budget=1, max_budget=9, reduction_factor=3, verbose=False)
    # rungs: 27 trials at budget 1, 9 at 3, 3 at 9
    assert budgets_seen.count(1) == 27
    assert budgets_seen.count(3) == 9
    assert budgets_seen.count(9) == 3
    assert len(hist) == 27 + 9 + 3
    # the survivor pool must contain the near-optimal configs
    assert abs(best["x"] - 0.3) < 0.2
    assert result["b"] == 9  # best came from a fully-trained trial


def test_hpo_tpe_sampler_beats_random_on_narrow_optimum():
    """The TPE surrogate (BOHB's model, reference utils/bayesOpt.py:76-115)
    must concentrate first-rung samples near the good region once seeded:
    on a narrow 2-d optimum it should land closer than quasi-random with
    the same budget."""
    import numpy as np

    from octa_tpu.utils.hpo import Uniform, tune_sha

    def make_eval():
        def eval_fn(p, budget, state):
            return {"score": -((p["x"] - 0.71) ** 2
                               + (p["y"] - 0.23) ** 2)}
        return eval_fn

    space = {"x": Uniform(0, 1), "y": Uniform(0, 1)}
    dists = {}
    for sampler in ("random", "tpe"):
        best, _, hist = tune_sha(space, make_eval(), "score",
                                 num_samples=30, min_budget=1, max_budget=1,
                                 seed=3, verbose=False, sampler=sampler)
        dists[sampler] = np.hypot(best["x"] - 0.71, best["y"] - 0.23)
    assert dists["tpe"] <= dists["random"] + 0.05, dists
    assert dists["tpe"] < 0.12, dists


def test_bayesopt_noise_sha_resume(tmp_path):
    """End-to-end bayesOpt_noise rung promotion: rung 2 must RESUME the
    promoted trial's run dir (fresh sibling fork with carried checkpoints),
    not crash on a missing checkpoint path (the trial parent dir has no
    checkpoints/ — only the timestamped run dir inside it does)."""
    import os

    from bayesOpt_noise import make_eval_fn
    from tests.test_train_seg import _config

    base = _config(tmp_path, res=64, epochs=1, n_files=4)
    base["Train"]["data"]["background"] = {
        "files": "/root/reference/datasets/background_images/*.png"}
    base["Train"]["data_augmentation"] = (
        [{"name": "LoadImaged", "keys": ["background"], "image_only": True},
         {"name": "EnsureChannelFirstd", "keys": ["background"],
          "strict_check": False, "channel_dim": "no_channel"},
         {"name": "Resized", "keys": ["background"],
          "spatial_size": [64, 64]},
         {"name": "ScaleIntensityd", "keys": ["background"],
          "minv": 0, "maxv": 1}]
        + base["Train"]["data_augmentation"][:3]
        + [{"name": "NoiseModeld", "keys": ["image"],
            "lambda_speckle": 0.7, "lambda_delta": 1.0,
            "lambda_gamma": 0.3}]
        + base["Train"]["data_augmentation"][3:])
    eval_fn = make_eval_fn(base, epochs_per_trial=1)

    params = {"lambda_speckle": 0.5, "lambda_delta": 0.8,
              "max_decrease_res": 0.5}
    r1 = eval_fn(params, 1, None)          # rung 1: 1 epoch from scratch
    assert os.path.exists(os.path.join(r1["trial_dir"], "metrics.csv"))
    r2 = eval_fn(params, 2, r1)            # rung 2: resume to 2 epochs
    assert r2["epochs_done"] == 2
    assert r2["trial_dir"] != r1["trial_dir"]
    with open(os.path.join(r2["trial_dir"], "metrics.csv")) as f:
        rows = f.read().strip().splitlines()
    assert len(rows) == 1 + 2  # header + carried epoch 0 + resumed epoch 1


def test_testpy_cli_writes_predictions_and_comparisons(tmp_path):
    """test.py end-to-end: per-image `{inference_mode}_{name}.png`
    predictions plus side-by-side comparison plots when
    Test.save_comparisons is set (reference test.py:82-89)."""
    import glob as _glob

    from octa_tpu.train.engine import train
    from tests.test_train_seg import Args, _config

    cfg = _config(tmp_path, res=64, epochs=1, n_files=4)
    run_dir = train(Args(), cfg)

    env = dict(ENV, OCTA_TPU_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, "test.py",
         "--config_file", os.path.join(run_dir, "config.yml"),
         "--epoch", "latest", "--num_samples", "2",
         "--Test.save_comparisons", "true"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=560)
    assert r.returncode == 0, r.stderr[-2000:]
    test_dir = os.path.join(run_dir, "test")
    preds = _glob.glob(os.path.join(test_dir, "model_*.png"))
    comps = _glob.glob(os.path.join(test_dir, "comparison_model_*.png"))
    assert len(preds) == 2, (preds, r.stderr[-500:])
    assert len(comps) == 2, comps
