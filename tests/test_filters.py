"""Classical vesselness baselines (reference models/frangi.py, oof.py,
skrgan.py): frangi parity vs skimage, structural checks for OOF/SkrGAN."""
import numpy as np
import jax.numpy as jnp
import pytest

from octa_tpu.ops import filters


def _vessel_image(rng, n=96):
    """Synthetic image with a bright horizontal vessel on noise."""
    img = rng.normal(0.1, 0.02, (n, n)).astype(np.float32)
    img[n // 2 - 2:n // 2 + 2, 8:-8] += 0.8
    return np.clip(img, 0, 1)


def test_frangi_matches_skimage(rng):
    skimage = pytest.importorskip("skimage")
    from skimage.filters import frangi as sk_frangi

    img = _vessel_image(rng)
    ours = np.asarray(filters.frangi(jnp.asarray(img)[None]))[0]
    ref = sk_frangi(img, black_ridges=False)
    # same ridge localization: top-activation mask overlap
    thr_o = ours > 0.5 * ours.max()
    thr_r = ref > 0.5 * ref.max()
    inter = (thr_o & thr_r).sum()
    union = (thr_o | thr_r).sum()
    assert inter / max(union, 1) > 0.6
    # correlation of responses
    c = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert c > 0.9


def test_oof_highlights_vessel(rng):
    img = _vessel_image(rng)
    resp = np.asarray(filters.oof(jnp.asarray(img)))
    assert resp.shape == img.shape
    on_vessel = resp[img.shape[0] // 2, 20:-20].mean()
    off_vessel = resp[10, 20:-20].mean()
    assert on_vessel > off_vessel


def test_skrgan_sketch_properties(rng):
    img = _vessel_image(rng)
    sketch = filters.skrgan_sketch(img)
    assert sketch.shape == img.shape
    assert np.isfinite(sketch).all()
    # edge map concentrates around the vessel borders
    border_band = np.abs(sketch[img.shape[0] // 2 - 6:img.shape[0] // 2 + 6])
    assert border_band.mean() > np.abs(sketch[:10]).mean()


def test_frangi_highlights_vessel(rng):
    img = _vessel_image(rng)
    resp = np.asarray(filters.frangi(jnp.asarray(img)[None]))[0]
    assert resp.shape == img.shape and np.isfinite(resp).all()
    on_vessel = resp[img.shape[0] // 2, 20:-20].mean()
    off_vessel = resp[10, 20:-20].mean()
    assert on_vessel > 5 * max(off_vessel, 1e-9)
