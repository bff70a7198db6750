"""3D skeletonization calibration against an independent numpy oracle.

The reference computes volumetric clDice with
``skimage.morphology.skeletonize(method='lee')``
(``/root/reference/utils/cldice.py:31-33``). skimage is not installed in
this image, and Lee's method needs sequential simple-point re-checking —
TPU-hostile. The TPU implementation (octa_tpu/ops/skeleton.py,
``skeletonize_3d``) is a subfield-parallel thinning: per pass it deletes
every simple, non-endpoint object voxel of one (z%2, y%2, x%2) parity
class simultaneously, which equals sequential deletion because equal-
parity voxels are never 26-adjacent. Simplicity is the Malandain &
Bertrand 1994 local characterization (one 26-component of object in N26,
one 6-component of background in N18 that touches a face neighbor).

The oracle here is an independent pure-numpy implementation of the SAME
published algorithm, written BFS-style per voxel (vs the JAX version's
vectorized min-label propagation). The JAX skeleton must match it
BIT-EXACTLY, and the resulting volumetric clDice values must agree to
float precision — the same calibration contract as the 2D Zhang-Suen
test (test_cldice_calibration.py).
"""
import glob

import numpy as np
import jax.numpy as jnp

from octa_tpu.ops import raster
from octa_tpu.ops.skeleton import cl_dice, skeletonize_3d

_OFFS26 = [(dz, dy, dx)
           for dz in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
           if (dz, dy, dx) != (0, 0, 0)]


def _block(x, z, y, w):
    """Zero-padded 3x3x3 neighborhood occupancy around (z, y, w)."""
    out = np.zeros((3, 3, 3), bool)
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                zz, yy, ww = z + dz, y + dy, w + dx
                if (0 <= zz < x.shape[0] and 0 <= yy < x.shape[1]
                        and 0 <= ww < x.shape[2]):
                    out[dz + 1, dy + 1, dx + 1] = x[zz, yy, ww]
    return out


def _bfs_components(nodes, adjacent):
    comps = []
    todo = set(nodes)
    while todo:
        seed = todo.pop()
        comp, stack = {seed}, [seed]
        while stack:
            cur = stack.pop()
            for nxt in list(todo):
                if adjacent(cur, nxt):
                    todo.discard(nxt)
                    comp.add(nxt)
                    stack.append(nxt)
        comps.append(comp)
    return comps


def _is_simple(block):
    """Malandain-Bertrand simple-point test on a 3x3x3 block (center is
    the candidate object voxel)."""
    obj = [(z, y, x) for (z, y, x) in np.ndindex(3, 3, 3)
           if (z, y, x) != (1, 1, 1) and block[z, y, x]]
    if not obj:
        return False

    def adj26(a, b):
        return max(abs(a[i] - b[i]) for i in range(3)) == 1

    if len(_bfs_components(obj, adj26)) != 1:
        return False

    bg18 = [(z, y, x) for (z, y, x) in np.ndindex(3, 3, 3)
            if (z, y, x) != (1, 1, 1)
            and abs(z - 1) + abs(y - 1) + abs(x - 1) <= 2
            and not block[z, y, x]]

    def adj6(a, b):
        return sum(abs(a[i] - b[i]) for i in range(3)) == 1

    comps = _bfs_components(bg18, adj6)
    touching = [c for c in comps
                if any(abs(z - 1) + abs(y - 1) + abs(x - 1) == 1
                       for (z, y, x) in c)]
    return len(touching) == 1


def skeletonize_3d_oracle(vol):
    x = (np.asarray(vol) > 0).copy()
    while True:
        changed = False
        for pz in (0, 1):
            for py in (0, 1):
                for px in (0, 1):
                    kills = []
                    for z, y, w in zip(*np.nonzero(x)):
                        if (z % 2, y % 2, w % 2) != (pz, py, px):
                            continue
                        blk = _block(x, z, y, w)
                        if int(blk.sum()) - 1 == 1:  # endpoint (center in)
                            continue
                        if _is_simple(blk):
                            kills.append((z, y, w))
                    for z, y, w in kills:
                        x[z, y, w] = False
                    changed = changed or bool(kills)
        if not changed:
            return x.astype(np.uint8)


def _volumes():
    vols = []
    tube = np.zeros((7, 9, 24), bool)
    tube[2:5, 3:6, 2:22] = True
    vols.append(("tube", tube))
    bent = np.zeros((7, 20, 20), bool)
    bent[2:5, 3:6, 2:17] = True
    bent[2:5, 3:17, 14:17] = True
    vols.append(("bent", bent))
    rng = np.random.default_rng(0)
    blob = np.zeros((10, 16, 16), bool)
    for _ in range(6):  # union of random small boxes (cavities + branches)
        z, y, x = rng.integers(0, 6), rng.integers(0, 10), rng.integers(0, 10)
        blob[z:z + rng.integers(2, 5), y:y + rng.integers(2, 7),
             x:x + rng.integers(2, 7)] = True
    vols.append(("blob", blob))
    csv = sorted(glob.glob(
        "/root/reference/datasets/vessel_graphs/*.csv"))[0]
    vol, _ = raster.voxelize_forest(raster.parse_graph_csv(csv), [48, 48, 12])
    real = np.asarray(vol) > 0.1
    vols.append(("real48", np.transpose(real, (2, 0, 1))))  # [D, H, W]
    return vols


def test_skeleton3d_matches_numpy_oracle_bit_exact():
    for name, v in _volumes():
        ours = np.asarray(skeletonize_3d(jnp.asarray(v)))
        ref = skeletonize_3d_oracle(v)
        mismatch = int((ours != ref).sum())
        assert mismatch == 0, (name, mismatch, int(ours.sum()),
                               int(ref.sum()))
        assert 0 < ours.sum() < v.sum()  # thinned, not erased


def test_cl_dice_3d_volumetric():
    # thick bent tube: a 1-voxel dilation keeps the medial line inside the
    # original, so clDice stays high while plain Dice drops
    from scipy.ndimage import binary_dilation

    _, tube = _volumes()[1]
    tube = tube.astype(np.float32)
    assert float(cl_dice(jnp.asarray(tube), jnp.asarray(tube))) == 1.0
    pred = binary_dilation(tube > 0, iterations=1).astype(np.float32)
    cld = float(cl_dice(jnp.asarray(pred), jnp.asarray(tube)))
    inter = float((pred * tube).sum())
    dice = 2 * inter / float(pred.sum() + tube.sum())
    assert cld > 0.95, cld
    assert cld > dice

    # real vessel voxelization: identity is exact, a shifted prediction
    # scores strictly lower
    _, v = _volumes()[3]
    v = v.astype(np.float32)
    assert float(cl_dice(jnp.asarray(v), jnp.asarray(v))) == 1.0
    shifted = np.roll(v, 3, axis=1)
    assert float(cl_dice(jnp.asarray(shifted), jnp.asarray(v))) < 0.9


def test_skeleton3d_slab_chunking_bit_exact():
    """The memory-bounded z-slab path (halo-1 lax.map, used for large
    volumes like the 3D-recon family's [44,1216,1216]) must match the
    full-volume computation voxel-for-voxel."""
    for name, v in _volumes()[:3]:
        full = np.asarray(skeletonize_3d(jnp.asarray(v)))
        for slab in (1, 2, 3):
            chunked = np.asarray(skeletonize_3d(jnp.asarray(v), slab=slab))
            assert (full == chunked).all(), (name, slab)
