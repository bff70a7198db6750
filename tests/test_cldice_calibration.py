"""clDice numerical calibration against an independent Zhang-Suen oracle.

The reference computes clDice with ``skimage.morphology.skeletonize``
(``/root/reference/utils/cldice.py:19-35``), whose 2D default implements
Zhang & Suen 1984 ("A fast parallel algorithm for thinning digital
patterns") with simultaneous deletion per sub-iteration. skimage is not
installed in this image, so the oracle here is an independent pure-numpy
implementation of the same published algorithm, written from the paper's
conditions (neighbor count B, 0->1 transition count A, the two
sub-iteration edge masks). The JAX skeleton (octa_tpu/ops/skeleton.py)
must match it BIT-EXACTLY on real bundled 1216² vessel labels, and the
resulting clDice values must agree to float precision — protecting the
0.5% Dice/clDice parity budget (SURVEY §7.3).

This test is intentionally NOT skippable (no importorskip): it runs on
bundled data with stdlib + numpy only.
"""
import glob

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from octa_tpu.ops import skeleton as sk

N_LABELS = 20
RES = 1216


def _zhang_suen_numpy(img: np.ndarray) -> np.ndarray:
    """Independent Zhang-Suen thinning oracle (simultaneous deletion).

    Deliberately written differently from the JAX version: neighbor rings
    are built by slicing a padded array into a [H, W, 8] stack in the
    paper's P2..P9 clockwise order.
    """
    x = (img > 0).astype(np.uint8)
    # P2..P9 = N, NE, E, SE, S, SW, W, NW as (dr, dc) shifts
    offs = [(-1, 0), (-1, 1), (0, 1), (1, 1),
            (1, 0), (1, -1), (0, -1), (-1, -1)]
    while True:
        changed = False
        for phase in (0, 1):
            z = np.pad(x, 1)
            h, w = x.shape
            ring = np.stack(
                [z[1 + dr:1 + dr + h, 1 + dc:1 + dc + w] for dr, dc in offs],
                axis=-1)                                   # [H, W, 8]
            b = ring.sum(-1)
            nxt = np.roll(ring, -1, axis=-1)
            a = ((ring == 0) & (nxt == 1)).sum(-1)
            p2, p4, p6, p8 = ring[..., 0], ring[..., 2], ring[..., 4], ring[..., 6]
            if phase == 0:
                edge = (p2 * p4 * p6 == 0) & (p4 * p6 * p8 == 0)
            else:
                edge = (p2 * p4 * p8 == 0) & (p2 * p6 * p8 == 0)
            kill = (x == 1) & (b >= 2) & (b <= 6) & (a == 1) & edge
            if kill.any():
                x[kill] = 0
                changed = True
        if not changed:
            return x


def _cl_dice_numpy(pred: np.ndarray, label: np.ndarray) -> float:
    """Reference clDice formula (``utils/cldice.py:19-35``) with oracle
    skeletons, in float64."""
    v_p = (pred > 0).astype(np.float64)
    v_l = (label > 0).astype(np.float64)
    s_p = _zhang_suen_numpy(pred).astype(np.float64)
    s_l = _zhang_suen_numpy(label).astype(np.float64)
    tprec = (v_p * s_l).sum() / max(s_l.sum(), 1e-8)
    tsens = (v_l * s_p).sum() / max(s_p.sum(), 1e-8)
    return 2 * tprec * tsens / max(tprec + tsens, 1e-8)


def _load_labels(n):
    files = sorted(glob.glob("datasets/labels/*.png"))
    assert len(files) >= n, "bundled dataset missing"
    # spread over the dataset for variety
    step = len(files) // n
    return [np.asarray(Image.open(files[i * step])).astype(np.uint8)
            for i in range(n)]


def _fake_predictions(label, rng):
    """Plausible prediction surrogates: dilated, eroded, and shifted+noisy
    variants of the label — the regimes where skeleton disagreements would
    move clDice."""
    from scipy import ndimage as ndi

    dil = ndi.binary_dilation(label, iterations=1).astype(np.uint8)
    ero = ndi.binary_erosion(label, iterations=1).astype(np.uint8)
    shift = np.roll(label, (2, -3), axis=(0, 1))
    noisy = (shift | (rng.random(label.shape) < 0.001)).astype(np.uint8)
    return {"dilated": dil, "eroded": ero, "shifted_noisy": noisy}


def test_skeleton_bitexact_vs_zhang_suen_oracle_on_bundled_labels():
    labels = _load_labels(N_LABELS)
    for i, lab in enumerate(labels):
        ours = np.asarray(sk.skeletonize(jnp.asarray(lab)))
        oracle = _zhang_suen_numpy(lab)
        mismatch = int((ours != oracle).sum())
        assert mismatch == 0, (
            f"label {i}: {mismatch} px differ from the Zhang-Suen oracle")


def test_cl_dice_calibration_on_bundled_labels():
    rng = np.random.default_rng(0)
    labels = _load_labels(6)
    max_delta = 0.0
    for lab in labels:
        for name, pred in _fake_predictions(lab, rng).items():
            ours = float(sk.cl_dice(jnp.asarray(pred), jnp.asarray(lab)))
            oracle = _cl_dice_numpy(pred, lab)
            delta = abs(ours - oracle)
            max_delta = max(max_delta, delta)
            # float32-reduction tolerance only — skeletons are bit-exact,
            # so any difference is summation precision, far inside the
            # 0.5% parity budget
            assert delta < 1e-5, (name, ours, oracle)
    print(f"max |clDice - oracle| = {max_delta:.2e}")


def test_cl_dice_sanity_identity():
    lab = _load_labels(1)[0]
    assert float(sk.cl_dice(jnp.asarray(lab), jnp.asarray(lab))) == \
        pytest.approx(1.0, abs=1e-6)
