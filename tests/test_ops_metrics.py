import jax.numpy as jnp
import numpy as np
import pytest

from octa_tpu.ops import morphology as morph
from octa_tpu.ops import skeleton as sk
from octa_tpu.utils import losses as L
from octa_tpu.utils.enums import Phase
from octa_tpu.utils.metrics import MetricsManager, roc_auc_score


def test_skeletonize_thick_line():
    img = np.zeros((32, 32), np.uint8)
    img[10:17, 4:28] = 1  # 7-wide bar
    out = np.asarray(sk.skeletonize(jnp.asarray(img)))
    assert out.sum() > 0
    # skeleton of a horizontal bar is a (nearly) 1-px horizontal line
    rows = np.nonzero(out)[0]
    assert rows.max() - rows.min() <= 1
    # idempotent
    out2 = np.asarray(sk.skeletonize(jnp.asarray(out)))
    np.testing.assert_array_equal(out, out2)


def test_skeletonize_preserves_connectivity():
    from scipy import ndimage as ndi

    img = np.zeros((48, 48), np.uint8)
    img[8:40, 20:27] = 1
    img[20:27, 8:40] = 1  # thick cross
    out = np.asarray(sk.skeletonize(jnp.asarray(img)))
    _, n = ndi.label(out, structure=np.ones((3, 3)))
    assert n == 1  # stays a single connected component


def test_cl_dice_perfect_and_partial():
    img = np.zeros((32, 32), np.float32)
    img[10:13, 4:28] = 1
    assert sk.cl_dice(jnp.asarray(img), jnp.asarray(img)) == pytest.approx(1.0)
    other = np.roll(img, 12, axis=0)
    assert float(sk.cl_dice(jnp.asarray(img), jnp.asarray(other))) < 0.2


def test_soft_skeleton_differentiable():
    import jax

    img = jnp.zeros((16, 16)).at[5:8, 2:14].set(1.0)

    def f(x):
        return jnp.sum(sk.soft_skeletonize(x, iters=5))

    g = jax.grad(f)(img)
    assert g.shape == img.shape
    assert np.isfinite(np.asarray(g)).all()


def test_remove_small_objects():
    m = np.zeros((20, 20), np.uint8)
    m[2:4, 2:4] = 1   # size 4
    m[10:16, 10:16] = 1  # size 36
    out = morph.remove_small_objects(m, min_size=10)
    assert out[2, 2] == 0 and out[12, 12] == 1
    # device version agrees
    dev = np.asarray(morph.remove_small_objects_device(jnp.asarray(m), min_size=10))
    np.testing.assert_array_equal(out > 0, dev > 0)


def test_keep_largest_cc():
    m = np.zeros((20, 20), np.uint8)
    m[1:3, 1:3] = 1
    m[5:15, 5:15] = 1
    out = morph.keep_largest_connected_component(m)
    assert out[1, 1] == 0 and out[10, 10] == 1


def test_dice_bce_loss_matches_manual():
    y = jnp.asarray(np.random.default_rng(0).integers(0, 2, (2, 8, 8, 1)).astype(np.float32))
    logits = jnp.asarray(np.random.default_rng(1).normal(size=(2, 8, 8, 1)).astype(np.float32))
    loss = L.DiceBCELoss(True)(logits, y)
    assert np.isfinite(float(loss))
    # perfect prediction drives loss toward 0
    perfect = (y * 2 - 1) * 20.0
    assert float(L.DiceBCELoss(True)(perfect, y)) < 0.01


def test_lsgan_loss():
    pred = jnp.ones((2, 4, 4, 1)) * 0.5
    assert float(L.LSGANLoss()(pred, True)) == pytest.approx(0.25)
    assert float(L.LSGANLoss()(pred, False)) == pytest.approx(0.25)


def test_patch_nce_loss_prefers_matching_pairs():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(64, 32)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    loss_match = L.PatchNCELoss(batch_size=1)(jnp.asarray(q), jnp.asarray(q)).mean()
    k = rng.normal(size=(64, 32)).astype(np.float32)
    k /= np.linalg.norm(k, axis=1, keepdims=True)
    loss_rand = L.PatchNCELoss(batch_size=1)(jnp.asarray(q), jnp.asarray(k)).mean()
    assert float(loss_match) < float(loss_rand)


def test_roc_auc_against_known():
    label = np.array([0, 0, 1, 1])
    pred = np.array([0.1, 0.4, 0.35, 0.8])
    assert roc_auc_score(pred, label) == pytest.approx(0.75)


def test_metrics_manager_phases_and_prefix():
    m = MetricsManager(Phase.TRAIN)
    assert set(m.metrics) == {"DSC", "IoU"}
    mv = MetricsManager(Phase.VALIDATION)
    assert {"DSC", "IoU", "ClDice", "AUC", "ACC", "Recall", "Precision"} == set(mv.metrics)
    pred = [np.ones((1, 16, 16))]
    label = [np.ones((1, 16, 16))]
    mv(pred, label)
    out = mv.aggregate_and_reset(prefix=str(Phase.VALIDATION))
    assert out["Validation_DSC"] == pytest.approx(1.0)
    assert mv.get_comp_metric(Phase.VALIDATION) == "Validation_DSC"
    assert mv.metrics["DSC"].scores == []
