"""Parity tests of the TPU rasterizer against the reference renderer.

The reference implementation (matplotlib Agg 2D, numpy 3D) is imported from
/root/reference for golden comparisons.
"""
import random
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")
from vessel_graph_generation import tree2img as ref_tree2img  # noqa: E402

from octa_tpu.ops import raster  # noqa: E402

CSV_DIR = "/root/reference/datasets/vessel_graphs"


def _load_sample_csv():
    import glob

    path = sorted(glob.glob(f"{CSV_DIR}/*.csv"))[0]
    return raster.parse_graph_csv(path)


def _arrays_to_forest(arrays, n=None):
    n = n or len(arrays["radius"])
    return [
        {
            "node1": arrays["node1"][i],
            "node2": arrays["node2"][i],
            "radius": arrays["radius"][i],
        }
        for i in range(n)
    ]


def test_parse_graph_csv():
    arrays = _load_sample_csv()
    e = len(arrays["radius"])
    assert e > 100
    assert arrays["node1"].shape == (e, 3)
    assert np.all(arrays["radius"] > 0)
    assert np.all(arrays["node1"] >= -0.2) and np.all(arrays["node1"] <= 1.2)


def test_2d_parity_with_reference():
    arrays = _load_sample_csv()
    forest = _arrays_to_forest(arrays)
    ref_img, _ = ref_tree2img.rasterize_forest(forest, [304, 304], 2)
    our_img, _ = raster.rasterize_forest(arrays, [304, 304], 2)
    ref = ref_img.astype(np.float32) / 255.0
    ours = our_img.astype(np.float32) / 255.0
    mad = np.abs(ref - ours).mean()
    assert mad < 0.03, f"mean abs diff too high: {mad}"
    # binarized at the reference label threshold (0.1): near-perfect overlap
    rb, ob = ref > 0.1, ours > 0.1
    iou = (rb & ob).sum() / max(1, (rb | ob).sum())
    assert iou > 0.95, f"binary IoU too low: {iou}"


def test_2d_min_radius_filter_matches():
    arrays = _load_sample_csv()
    forest = _arrays_to_forest(arrays)
    ref_img, _ = ref_tree2img.rasterize_forest(
        forest, [304, 304], 2, min_radius=0.0033
    )
    our_img, _ = raster.rasterize_forest(arrays, [304, 304], 2, min_radius=0.0033)
    rb = ref_img.astype(np.float32) / 255.0 > 0.1
    ob = our_img.astype(np.float32) / 255.0 > 0.1
    iou = (rb & ob).sum() / max(1, (rb | ob).sum())
    assert iou > 0.93


def test_3d_voxelize_exact_math():
    arrays = _load_sample_csv()
    n = 150  # keep the (slow) reference python loop small
    sub = {k: v[:n] for k, v in arrays.items()}
    forest = _arrays_to_forest(sub)
    ref_vol, _ = ref_tree2img.voxelize_forest(forest, [76, 76, 16])
    our_vol, _ = raster.voxelize_forest(sub, [76, 76, 16])
    assert our_vol.shape == ref_vol.shape
    diff = np.abs(ref_vol.astype(np.int32) - our_vol.astype(np.int32))
    # identical up to float32-vs-float64 rounding at the uint16 cast
    assert (diff > 1).mean() < 1e-4, f"mismatch frac {(diff > 1).mean()}"
    assert diff.max() <= 2


def test_dropout_blackdict_paired():
    arrays = _load_sample_csv()
    rkeep = np.ones(len(arrays["radius"]), dtype=bool)
    rng = random.Random(7)
    keep1, bd = raster.edge_dropout(
        arrays["node1"], arrays["node2"], rkeep, max_dropout_prob=0.9, rng=rng
    )
    assert 0 < keep1.sum() < len(keep1)
    # Paired render (reference semantics, tree2img.py:60-84): with a provided
    # blackdict no new random drops occur; an edge is dropped iff its proximal
    # node is in the blackdict. Directly-dropped edges from pass 1 whose
    # parent survived are re-kept; their descendants stay dropped.
    keep2, _ = raster.edge_dropout(
        arrays["node1"], arrays["node2"], rkeep, max_dropout_prob=0.9,
        blackdict=dict(bd), rng=random.Random(99),
    )
    expected2 = np.array(
        [tuple(arrays["node2"][i]) not in bd for i in range(len(rkeep))]
    )
    assert np.array_equal(keep2, expected2)
    # every edge kept in pass 1 is kept in pass 2
    assert np.all(keep2[keep1])


def test_dropout_cascades_to_descendants():
    # chain a->b->c->d: dropping edge (b,a) must drop (c,b) and (d,c)
    n1 = np.array([[0.2, 0.2, 0.5], [0.3, 0.3, 0.5], [0.4, 0.4, 0.5]])
    n2 = np.array([[0.1, 0.1, 0.5], [0.2, 0.2, 0.5], [0.3, 0.3, 0.5]])
    bd = {tuple(n2[0]): True}
    keep, bd = raster.edge_dropout(
        n1, n2, np.ones(3, bool), max_dropout_prob=0.0, blackdict=bd
    )
    assert not keep.any()


@pytest.mark.parametrize("mip_axis", [0, 1, 2])
def test_2d_mip_axes(mip_axis):
    arrays = _load_sample_csv()
    sub = {k: v[:200] for k, v in arrays.items()}
    forest = _arrays_to_forest(sub)
    ref_img, _ = ref_tree2img.rasterize_forest(forest, [128, 128], mip_axis)
    our_img, _ = raster.rasterize_forest(sub, [128, 128], mip_axis)
    mad = np.abs(ref_img / 255.0 - our_img / 255.0).mean()
    assert mad < 0.02, f"axis {mip_axis} mad {mad}"


def test_native_csv_parser_matches_python():
    import glob

    import octa_tpu.native as nat
    from octa_tpu.native import parse_graph_csv_native

    path = sorted(glob.glob(f"{CSV_DIR}/*.csv"))[0]
    native = parse_graph_csv_native(path)
    if native is None:
        pytest.skip("native toolchain unavailable")
    prev_failed, prev_lib = nat._failed, nat._lib
    nat._failed, nat._lib = True, None  # force python fallback
    try:
        py = raster.parse_graph_csv(path)
    finally:
        nat._failed, nat._lib = prev_failed, prev_lib
    np.testing.assert_allclose(native["node1"], py["node1"])
    np.testing.assert_allclose(native["node2"], py["node2"])
    np.testing.assert_allclose(native["radius"], py["radius"])
