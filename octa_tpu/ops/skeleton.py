"""Skeletonization and clDice on TPU.

- :func:`skeletonize` — Zhang-Suen two-subiteration thinning, the algorithm
  behind ``skimage.morphology.skeletonize`` (2D) used by the reference's
  clDice metric (``utils/cldice.py:19-35``). Fully vectorized elementwise
  update under ``lax.while_loop`` (simultaneous deletion per sub-iteration),
  vmap-able over a batch.
- :func:`skeletonize_3d` — 3D curve thinning for the reference's volumetric
  clDice path (``utils/cldice.py:31-33`` uses skimage's lee method there).
  TPU-first redesign: subfield-parallel deletion of simple points
  (Malandain & Bertrand's local characterization), provably topology-safe
  under simultaneous deletion because same-parity voxels are never
  26-adjacent — no sequential re-checking, everything is elementwise.
- :func:`soft_skeletonize` — differentiable min/max-pool soft skeleton
  (Shit et al., clDice loss), usable as a training loss on TPU.
- :func:`cl_score` / :func:`cl_dice` — topology precision/sensitivity.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _neighbors(img):
    """The 8 neighbors P2..P9 (N, NE, E, SE, S, SW, W, NW) via zero-padded
    shifts. img: [..., H, W] float/bool."""
    z = jnp.pad(img, [(0, 0)] * (img.ndim - 2) + [(1, 1), (1, 1)])
    h, w = img.shape[-2], img.shape[-1]

    def sh(dr, dc):
        return jax.lax.dynamic_slice_in_dim(
            jax.lax.dynamic_slice_in_dim(z, 1 + dr, h, axis=img.ndim - 2),
            1 + dc, w, axis=img.ndim - 1,
        )

    p2 = sh(-1, 0)   # N
    p3 = sh(-1, 1)   # NE
    p4 = sh(0, 1)    # E
    p5 = sh(1, 1)    # SE
    p6 = sh(1, 0)    # S
    p7 = sh(1, -1)   # SW
    p8 = sh(0, -1)   # W
    p9 = sh(-1, -1)  # NW
    return p2, p3, p4, p5, p6, p7, p8, p9


def _zhang_subiter(img, first: bool):
    p = _neighbors(img)
    p2, p3, p4, p5, p6, p7, p8, p9 = [x.astype(jnp.int32) for x in p]
    b = p2 + p3 + p4 + p5 + p6 + p7 + p8 + p9
    seq = [p2, p3, p4, p5, p6, p7, p8, p9, p2]
    a = jnp.zeros_like(b)
    for i in range(8):
        a = a + ((seq[i] == 0) & (seq[i + 1] == 1)).astype(jnp.int32)
    cond = (img == 1) & (b >= 2) & (b <= 6) & (a == 1)
    if first:
        cond = cond & (p2 * p4 * p6 == 0) & (p4 * p6 * p8 == 0)
    else:
        cond = cond & (p2 * p4 * p8 == 0) & (p2 * p6 * p8 == 0)
    return jnp.where(cond, 0, img)


@jax.jit
def skeletonize(img: jax.Array) -> jax.Array:
    """Zhang-Suen thinning of a binary image [H, W] (or batched [..., H, W]).

    Returns a uint8 skeleton. Matches skimage.morphology.skeletonize (Zhang's
    method, the 2D default) up to its identical simultaneous-deletion rule.
    """
    x0 = (img > 0).astype(jnp.uint8)

    def cond(state):
        x, changed = state
        return changed

    def body(state):
        x, _ = state
        x1 = _zhang_subiter(x, True)
        x2 = _zhang_subiter(x1, False)
        return x2, jnp.any(x2 != x)

    out, _ = jax.lax.while_loop(cond, body, (x0, jnp.array(True)))
    return out


# ---------------------------------------------------------------------------
# 3D curve thinning (volumetric clDice path)
# ---------------------------------------------------------------------------

# The 26 neighborhood offsets (dz, dy, dx), fixed order.
_OFF26 = [(dz, dy, dx)
          for dz in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
          if (dz, dy, dx) != (0, 0, 0)]
# Indices (into _OFF26) of the 18-neighborhood (face + edge) and the 6 faces.
_IDX18 = [i for i, o in enumerate(_OFF26) if sum(map(abs, o)) <= 2]
_IS_FACE18 = np.array([sum(map(abs, _OFF26[i])) == 1 for i in _IDX18])
# Adjacency lists: 26-adjacency among the 26 positions (Chebyshev dist 1)…
_ADJ26 = [[j for j, oj in enumerate(_OFF26)
           if j != i and max(abs(oi[k] - oj[k]) for k in range(3)) <= 1]
          for i, oi in enumerate(_OFF26)]
# …and 6-adjacency among the 18 positions (Manhattan dist 1).
_OFF18 = [_OFF26[i] for i in _IDX18]
_ADJ18 = [[j for j, oj in enumerate(_OFF18)
           if sum(abs(oi[k] - oj[k]) for k in range(3)) == 1]
          for i, oi in enumerate(_OFF18)]


def _shifted(x, off):
    """x shifted by -off with zero (background) padding: element [z,y,x]
    holds the occupancy of the voxel at [z,y,x] + off."""
    z = jnp.pad(x, [(1, 1)] * 3)
    d, h, w = x.shape
    return jax.lax.dynamic_slice(
        z, (1 + off[0], 1 + off[1], 1 + off[2]), (d, h, w))


def _count_components(occ, adj, hops, seed_flag=None):
    """Per-voxel connected-component count over a fixed small neighborhood
    graph, via min-label propagation (exact: converges when no label
    changes, bounded by ``hops`` >= graph diameter; typical configurations
    settle in <= 6 hops, so the loop early-exits on a fixed point).

    occ: [K, D, H, W] bool — occupancy of the K neighborhood positions.
    adj: adjacency lists among the K positions.
    seed_flag: optional [K] bool — when given, only components containing
    a flagged position are counted (the "6-adjacent to p" condition).
    Returns [D, H, W] int8 component counts. Labels are int8 (K <= 26)."""
    k_n = len(adj)
    big = jnp.int8(k_n)
    ids = jnp.arange(k_n, dtype=jnp.int8)[:, None, None, None]
    lab0 = jnp.where(occ, ids, big)
    if seed_flag is not None:
        flag0 = occ & jnp.asarray(seed_flag)[:, None, None, None]
    else:
        flag0 = None

    def hop_once(lab, flag):
        new_lab = []
        new_flag = []
        for i in range(k_n):
            m = functools.reduce(jnp.minimum, [lab[j] for j in adj[i]],
                                 lab[i])
            new_lab.append(jnp.where(occ[i], m, big))
            if flag is not None:
                f = functools.reduce(
                    jnp.logical_or, [flag[j] for j in adj[i]], flag[i])
                new_flag.append(occ[i] & f)
        return (jnp.stack(new_lab),
                jnp.stack(new_flag) if flag is not None else None)

    def cond(state):
        i, _, _, changed = state
        return changed & (i < hops)

    def body(state):
        i, lab, flag, _ = state
        new_lab, new_flag = hop_once(lab, flag)
        changed = jnp.any(new_lab != lab)
        if flag is not None:
            changed = changed | jnp.any(new_flag != flag)
        return i + 1, new_lab, new_flag, changed

    _, lab, flag, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), lab0, flag0, jnp.array(True)))
    roots = occ & (lab == ids)
    if flag is not None:
        roots = roots & flag
    return jnp.sum(roots.astype(jnp.int8), axis=0)


def _simple_and_endpoint(x):
    """Simple-point and curve-endpoint masks for a binary volume [D, H, W].

    A voxel is *simple* (deletable without changing topology) iff exactly
    one 26-connected component of object voxels exists in its 26-
    neighborhood AND exactly one 6-connected component of background
    voxels in its 18-neighborhood is 6-adjacent to it (Malandain &
    Bertrand 1994 characterization). *Endpoints* (exactly one object
    neighbor) anchor the medial curve."""
    nb26 = jnp.stack([_shifted(x, o) for o in _OFF26])       # [26, D, H, W]
    n_obj = jnp.sum(nb26.astype(jnp.int32), axis=0)
    # (a) one 26-component of object in N26
    c_obj = _count_components(nb26, _ADJ26, hops=len(_OFF26) - 1)
    # (b) one 6-component of background in N18 touching a face neighbor
    bg18 = ~nb26[jnp.asarray(_IDX18)]
    c_bg = _count_components(bg18, _ADJ18, hops=len(_IDX18) - 1,
                             seed_flag=_IS_FACE18)
    simple = x & (c_obj == 1) & (c_bg == 1)
    endpoint = x & (n_obj == 1)
    return simple, endpoint


def _deletable(x):
    """simple & ~endpoint mask for a binary volume [D, H, W]."""
    simple, endpoint = _simple_and_endpoint(x)
    return simple & ~endpoint


@functools.partial(jax.jit, static_argnames=("slab",))
def skeletonize_3d(vol: jax.Array, slab: int | None = None) -> jax.Array:
    """Curve thinning of a binary volume [D, H, W] to its medial lines
    (the role of skimage's ``skeletonize(method='lee')`` in the
    reference's 3D clDice, ``utils/cldice.py:31-33``).

    Subfield-parallel simple-point deletion: each pass deletes every
    simple, non-endpoint object voxel of ONE parity class (z%2, y%2,
    x%2). Voxels of equal parity are never 26-adjacent, so deleting them
    simultaneously equals deleting them sequentially — each deletion is
    topology-preserving by the simple-point property, with no sequential
    re-check loop (the TPU-hostile part of Lee's method). Iterates 8-
    subfield sweeps until a fixed point. Returns uint8.

    Memory: the simple-point test carries a [26, D, H, W] label state, so
    for large volumes (the shipped 3D-recon family evaluates [44, 1216,
    1216] — 65M voxels, a ~1.7 GB state) the deletable mask is computed
    in z-slabs with a 1-voxel halo via ``lax.map`` (the mask at plane z
    depends only on planes z-1..z+1), bounding the state to
    [26, slab+2, H, W]. ``slab`` is auto-picked to keep that under
    ~160 MB; pass it explicitly to override. Expect tens of seconds per
    full-resolution volume on a v5e — this is a once-per-evaluation
    metric, not a training-step op."""
    x0 = vol > 0
    d, h, w = x0.shape
    if slab is None:
        budget = 160e6 // max(26 * h * w, 1)  # int8 label-state planes
        slab = int(max(1, min(d, budget - 2)))
    n_slabs = -(-d // slab)
    d_pad = n_slabs * slab
    gz, gy, gx = jnp.meshgrid(jnp.arange(d), jnp.arange(h), jnp.arange(w),
                              indexing="ij")

    if n_slabs == 1:
        deletable = _deletable
    else:
        def deletable(x):
            # halo-padded slabs: plane z's mask needs planes z-1..z+1
            xp = jnp.pad(x, ((1, 1 + d_pad - d), (0, 0), (0, 0)))

            def one(i):
                xs = jax.lax.dynamic_slice_in_dim(xp, i * slab, slab + 2, 0)
                return _deletable(xs)[1:-1]

            masks = jax.lax.map(one, jnp.arange(n_slabs))
            return masks.reshape(d_pad, h, w)[:d]

    def sweep(x):
        changed = jnp.array(False)
        for pz in (0, 1):
            for py in (0, 1):
                for px in (0, 1):
                    sf = (gz % 2 == pz) & (gy % 2 == py) & (gx % 2 == px)
                    kill = deletable(x) & sf
                    changed = changed | jnp.any(kill)
                    x = x & ~kill
        return x, changed

    def cond(state):
        return state[1]

    def body(state):
        return sweep(state[0])

    out, _ = jax.lax.while_loop(cond, body, sweep(x0))
    return out.astype(jnp.uint8)


def _pool(x, mode, size=3):
    init = -jnp.inf if mode == "max" else jnp.inf
    op = jax.lax.max if mode == "max" else jax.lax.min
    pad = size // 2
    return jax.lax.reduce_window(
        x, init, op,
        window_dimensions=(1,) * (x.ndim - 2) + (size, size),
        window_strides=(1,) * x.ndim,
        padding=[(0, 0)] * (x.ndim - 2) + [(pad, pad), (pad, pad)],
    )


def soft_erode(x):
    return -_pool(-x, "max")


def soft_dilate(x):
    return _pool(x, "max")


def soft_open(x):
    return soft_dilate(soft_erode(x))


@functools.partial(jax.jit, static_argnames=("iters",))
def soft_skeletonize(x: jax.Array, iters: int = 25) -> jax.Array:
    """Differentiable soft skeleton (clDice loss; Shit et al. CVPR'21).

    x: [..., H, W] soft segmentation in [0, 1].
    """
    img1 = soft_open(x)
    skel = jax.nn.relu(x - img1)

    def body(i, carry):
        img, skel = carry
        img = soft_erode(img)
        opened = soft_open(img)
        delta = jax.nn.relu(img - opened)
        skel = skel + jax.nn.relu(delta - skel * delta)
        return img, skel

    _, skel = jax.lax.fori_loop(0, iters, body, (soft_erode(x), skel))
    return skel


def cl_score(v: jax.Array, s: jax.Array) -> jax.Array:
    """Skeleton volume overlap (reference ``cldice.py:6-16``)."""
    return jnp.sum(v * s) / jnp.maximum(jnp.sum(s), 1e-8)


def cl_dice(v_p: jax.Array, v_l: jax.Array) -> jax.Array:
    """clDice metric between binary prediction and label (reference
    ``cldice.py:19-35``): 2D inputs [H, W] use Zhang-Suen thinning; 3D
    inputs [D, H, W] use volumetric curve thinning (the reference's
    ``method='lee'`` branch for 3D-recon volumes)."""
    skel = skeletonize_3d if v_p.ndim == 3 else skeletonize
    v_p = (v_p > 0).astype(jnp.float32)
    v_l = (v_l > 0).astype(jnp.float32)
    s_l = skel(v_l).astype(jnp.float32)
    s_p = skel(v_p).astype(jnp.float32)
    tprec = cl_score(v_p, s_l)
    tsens = cl_score(v_l, s_p)
    return 2 * tprec * tsens / jnp.maximum(tprec + tsens, 1e-8)


def soft_cl_dice_loss(y_pred: jax.Array, y_true: jax.Array,
                      iters: int = 25, smooth: float = 1.0) -> jax.Array:
    """Differentiable clDice loss term (1 - soft clDice)."""
    skel_pred = soft_skeletonize(y_pred, iters)
    skel_true = soft_skeletonize(y_true, iters)
    tprec = (jnp.sum(skel_pred * y_true) + smooth) / (jnp.sum(skel_pred) + smooth)
    tsens = (jnp.sum(skel_true * y_pred) + smooth) / (jnp.sum(skel_true) + smooth)
    return 1.0 - 2.0 * tprec * tsens / (tprec + tsens)
