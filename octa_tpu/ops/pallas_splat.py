"""Pallas TPU kernel for antialiased 2D line splatting.

This is the hot path of vessel-graph rasterization (the reference renders with
matplotlib Agg on the host, ``vessel_graph_generation/tree2img.py:12-114``; our
XLA fallback is :func:`octa_tpu.ops.raster.splat_lines_2d`). The XLA scan
version pays ``k_max`` edge evaluations for *every* tile — the per-tile edge
histogram is extremely skewed (background tiles see a handful of edges, macular
tiles a few hundred), so most of that VPU work is masked-out waste, and the
``(n_tiles, T, T)`` accumulator makes an HBM round-trip per scan step.

The Pallas kernel instead:

- pre-gathers (in XLA) a per-tile packed edge list plus a per-tile count,
- runs one grid step per image tile with the ``(T, T)`` accumulator resident
  in VMEM,
- loops only ``ceil(count/8)`` times per tile (``lax.fori_loop`` with a
  dynamic, tile-dependent bound), evaluating 8 edges per iteration on the VPU.

Coverage law (identical to the XLA path, calibrated against Agg): for pixel
center p and segment (a, b) with half-width h,
``alpha = clip(min(d+h, 0.5) - max(d-h, -0.5), 0, 1)``, where d is the
distance from p to the segment; alphas composite as ``1 - prod(1 - alpha)``.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 8  # edges evaluated per inner-loop iteration


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _splat_tile_kernel(counts_ref, rowcol_ref, data_ref, out_ref, acc_ref,
                       *, tile: int):
    """One grid step = one (tile × tile) image tile.

    counts_ref: [N] int32 (scalar prefetch) — valid edges for this tile.
    rowcol_ref: [N, 2] int32 (scalar prefetch) — tile origin (row0, col0).
    data_ref:   [1, K, 8] f32 VMEM block — packed edges, rows
                (ay, ax, aby, abx, inv_denom, half, 0, 0), overlap-first.
    out_ref:    [1, tile, tile] f32 — coverage in [0, 1].
    acc_ref:    [tile, tile] f32 VMEM scratch — product of (1 - alpha).
    """
    t = pl.program_id(0)
    n = counts_ref[t]
    row0 = rowcol_ref[t, 0].astype(jnp.float32)
    col0 = rowcol_ref[t, 1].astype(jnp.float32)

    iy = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    py = row0 + 0.5 + iy.astype(jnp.float32)
    px = col0 + 0.5 + ix.astype(jnp.float32)

    acc_ref[:] = jnp.ones((tile, tile), jnp.float32)

    def body(c, acc):
        base = c * _CHUNK
        rows = data_ref[0, pl.ds(base, _CHUNK), :]  # [_CHUNK, 8]
        for u in range(_CHUNK):
            ay, ax = rows[u, 0], rows[u, 1]
            aby, abx = rows[u, 2], rows[u, 3]
            invd, h = rows[u, 4], rows[u, 5]
            t_par = ((py - ay) * aby + (px - ax) * abx) * invd
            t_par = jnp.clip(t_par, 0.0, 1.0)
            dy = py - (ay + t_par * aby)
            dx = px - (ax + t_par * abx)
            d = jnp.sqrt(dy * dy + dx * dx)
            alpha = jnp.clip(
                jnp.minimum(d + h, 0.5) - jnp.maximum(d - h, -0.5), 0.0, 1.0
            )
            alpha = jnp.where(base + u < n, alpha, 0.0)
            acc = acc * (1.0 - alpha)
        return acc

    acc = jax.lax.fori_loop(
        0, pl.cdiv(n, _CHUNK), body, acc_ref[:], unroll=False
    )
    out_ref[0] = 1.0 - acc


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile", "k_max", "span_", "interpret"),
)
def splat_lines_2d_pallas(
    a: jax.Array,
    b: jax.Array,
    width_px: jax.Array,
    valid: jax.Array,
    *,
    height: int,
    width: int,
    tile: int = 128,
    k_max: int = 4096,
    span_: int = 2,
    interpret: bool = False,
) -> jax.Array:
    """Antialiased 2D line splatting (Pallas TPU kernel).

    a, b: [E, 2] or [B, E, 2] endpoints in pixel (row, col) coordinates;
    width_px: [E] / [B, E] stroke widths in pixels; valid: matching bool mask.
    Returns coverage [height, width] (or [B, height, width]) in [0, 1].
    """
    batched = a.ndim == 3
    if not batched:
        a, b = a[None], b[None]
        width_px, valid = width_px[None], valid[None]
    bsz, e = a.shape[0], a.shape[1]
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    width_px = width_px.astype(jnp.float32)

    nty, ntx = _cdiv(height, tile), _cdiv(width, tile)
    tiles_per_img = nty * ntx
    n_tiles = bsz * tiles_per_img
    k = min(k_max, _cdiv(max(e, _CHUNK), _CHUNK) * _CHUNK)

    half = width_px * 0.5
    reach = half + 1.0  # AA fringe
    bbox_lo = jnp.minimum(a, b) - reach[..., None]
    bbox_hi = jnp.maximum(a, b) + reach[..., None]

    # --- tile binning: one sorted (tile, edge) pair list per image ----------
    # Each edge lands in at most `span`² tiles (callers guarantee the dilated
    # bbox fits in (span-1)·tile per dim; the default span=2 covers any bbox
    # up to `tile` px). Sorting B×span²E i32 keys beats per-tile argsorts of
    # the full E×n_tiles overlap matrix by an order of magnitude.
    ty0 = jnp.floor(bbox_lo[..., 0] / tile).astype(jnp.int32)
    tx0 = jnp.floor(bbox_lo[..., 1] / tile).astype(jnp.int32)
    ty1 = jnp.floor(bbox_hi[..., 0] / tile).astype(jnp.int32)
    tx1 = jnp.floor(bbox_hi[..., 1] / tile).astype(jnp.int32)
    span = int(span_)
    keys, payload = [], []
    eid = jnp.broadcast_to(jnp.arange(e, dtype=jnp.int32), (bsz, e))
    for sy in range(span):
        for sx in range(span):
            ty = ty0 + sy
            tx = tx0 + sx
            live = (
                (ty <= ty1) & (tx <= tx1)
                & (ty >= 0) & (ty < nty) & (tx >= 0) & (tx < ntx)
                & valid
            )
            keys.append(jnp.where(live, ty * ntx + tx, tiles_per_img))
            payload.append(eid)
    keys = jnp.concatenate(keys, axis=-1)          # [B, span²E]
    payload = jnp.concatenate(payload, axis=-1)
    keys, payload = jax.lax.sort_key_val(keys, payload, dimension=-1)

    # per-tile segment starts within each image's sorted pair list
    tgrid = jnp.arange(tiles_per_img + 1, dtype=jnp.int32)
    starts = jax.vmap(
        lambda kk: jnp.searchsorted(kk, tgrid, side="left")
    )(keys).astype(jnp.int32)                      # [B, nt+1]
    counts = (starts[:, 1:] - starts[:, :-1]).reshape(n_tiles)
    counts = jnp.minimum(counts, k).astype(jnp.int32)

    # dense per-tile packed edge data via gather from the sorted pair list
    slot = jnp.arange(k, dtype=jnp.int32)
    src_pos = starts[:, :-1, None] + slot[None, None, :]     # [B, nt, k]
    src_pos = jnp.minimum(src_pos, keys.shape[-1] - 1)
    idx = jnp.take_along_axis(
        payload, src_pos.reshape(bsz, -1), axis=-1
    ).reshape(bsz, tiles_per_img, k)

    ga = a[jnp.arange(bsz)[:, None, None], idx]          # [B, nt, k, 2]
    gb = b[jnp.arange(bsz)[:, None, None], idx]
    gh = half[jnp.arange(bsz)[:, None, None], idx]       # [B, nt, k]
    gab = gb - ga
    denom = jnp.sum(gab * gab, -1)
    invd = 1.0 / jnp.maximum(denom, 1e-12)
    zeros = jnp.zeros_like(gh)
    packed = jnp.stack(
        [ga[..., 0], ga[..., 1], gab[..., 0], gab[..., 1], invd, gh,
         zeros, zeros], -1)
    packed = packed.reshape(n_tiles, k, 8)

    t_lin = jnp.arange(tiles_per_img, dtype=jnp.int32)
    rowcol = jnp.tile(
        jnp.stack([(t_lin // ntx) * tile, (t_lin % ntx) * tile], -1),
        (bsz, 1),
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, k, 8), lambda i, c, rc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, tile), lambda i, c, rc: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tile, tile), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_splat_tile_kernel, tile=tile),
        out_shape=jax.ShapeDtypeStruct((n_tiles, tile, tile), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(counts, rowcol, packed)

    img = out.reshape(bsz, nty, ntx, tile, tile).transpose(0, 1, 3, 2, 4)
    img = img.reshape(bsz, nty * tile, ntx * tile)[:, :height, :width]
    return img if batched else img[0]


# ---------------------------------------------------------------------------
# 3D capsule voxelizer (exact math of ops.raster.splat_capsules_3d)
# ---------------------------------------------------------------------------

_CHUNK3 = 8


def _splat3d_tile_kernel(counts_ref, rowcol_ref, data_ref, out_ref, acc_ref,
                         *, ty: int, tx: int, zdim: int):
    """One grid step = one (zdim x ty x tx) volume tile (z never tiled).

    data_ref: [1, K, 16] f32 — packed edges, rows
      (ax, ay, az, sx, sy, sz, invd, r, lox, loy, loz, hix, hiy, hiz, 0, 0)
      where (x, y) here are the volume's leading two axes and z the last.
    out_ref: [1, zdim, ty, tx] f32 — max-composited contributions (pre-clip).
    """
    t = pl.program_id(0)
    n = counts_ref[t]
    row0 = rowcol_ref[t, 0].astype(jnp.float32)
    col0 = rowcol_ref[t, 1].astype(jnp.float32)

    shape = (zdim, ty, tx)
    vz = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32)
    vx = row0 + jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(
        jnp.float32)
    vy = col0 + jax.lax.broadcasted_iota(jnp.int32, shape, 2).astype(
        jnp.float32)
    cz, cx, cy = vz + 0.5, vx + 0.5, vy + 0.5
    diag = math.sqrt(3.0)

    acc_ref[:] = jnp.full(shape, -jnp.inf, jnp.float32)

    def body(c, acc):
        base = c * _CHUNK3
        rows = data_ref[0, pl.ds(base, _CHUNK3), :]  # [_CHUNK3, 16]
        for u in range(_CHUNK3):
            ax, ay, az = rows[u, 0], rows[u, 1], rows[u, 2]
            sx, sy, sz = rows[u, 3], rows[u, 4], rows[u, 5]
            invd, r = rows[u, 6], rows[u, 7]
            lox, loy, loz = rows[u, 8], rows[u, 9], rows[u, 10]
            hix, hiy, hiz = rows[u, 11], rows[u, 12], rows[u, 13]
            dx0, dy0, dz0 = cx - ax, cy - ay, cz - az
            tpar = (dx0 * sx + dy0 * sy + dz0 * sz) * invd
            inside = (tpar > 0.0) & (tpar < 1.0)
            px, py, pz = dx0 - tpar * sx, dy0 - tpar * sy, dz0 - tpar * sz
            d_orth = jnp.sqrt(px * px + py * py + pz * pz)
            d_a = jnp.sqrt(dx0 * dx0 + dy0 * dy0 + dz0 * dz0)
            bx, by, bz = cx - (ax + sx), cy - (ay + sy), cz - (az + sz)
            d_b = jnp.sqrt(bx * bx + by * by + bz * bz)
            d_end = jnp.minimum(d_a, d_b)
            base_term = r - diag / 2.0
            c_seg = 1.0 - (d_orth - base_term) / diag
            c_end = 1.0 - (d_end - base_term) / diag
            contrib = jnp.where(inside, jnp.maximum(c_seg, c_end), c_end)
            in_bbox = ((vx >= lox) & (vx < hix) & (vy >= loy) & (vy < hiy)
                       & (vz >= loz) & (vz < hiz))
            ok = in_bbox & (base + u < n)
            acc = jnp.maximum(acc, jnp.where(ok, contrib, -jnp.inf))
        return acc

    acc = jax.lax.fori_loop(0, pl.cdiv(n, _CHUNK3), body, acc_ref[:],
                            unroll=False)
    out_ref[0] = acc


@functools.partial(
    jax.jit,
    static_argnames=("dims", "tile", "k_max", "span_", "interpret"),
)
def splat_capsules_3d_pallas(
    a: jax.Array,
    b: jax.Array,
    radius: jax.Array,
    valid: jax.Array,
    *,
    dims: tuple[int, int, int],
    tile: tuple[int, int] = (32, 128),
    k_max: int = 1024,
    span_: tuple[int, int] = (4, 2),
    interpret: bool = False,
) -> jax.Array:
    """3D capsule splatting (Pallas TPU kernel), exact math of
    ``voxelize_forest`` (reference ``tree2img.py:176-280``): per-edge cuboid
    bbox offset r*sqrt(2), contribution ``1 - (d - (r - diag/2))/diag``
    max-composited, orthogonal distance only strictly inside the segment.

    a, b: [E, 3] endpoints in voxel coordinates; radius [E]; dims (X, Y, Z)
    with Z small (the slab axis, kept whole per tile). ``span_`` bounds the
    per-axis tile span of one edge's bbox (bbox_extent < (span-1)*tile).
    Returns [dims] clipped to [0, 1].
    """
    X, Y, Z = dims
    ty_, tx_ = tile
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    radius = radius.astype(jnp.float32)
    e = a.shape[0]
    k = min(k_max, _cdiv(max(e, _CHUNK3), _CHUNK3) * _CHUNK3)

    off = radius * math.sqrt(2.0)
    lo = jnp.floor(jnp.minimum(a, b) - off[:, None])
    hi = jnp.ceil(jnp.maximum(a, b) + off[:, None] + 1.0)  # exclusive

    nty, ntx = _cdiv(X, ty_), _cdiv(Y, tx_)
    n_tiles = nty * ntx

    # tile binning on (x=axis0, y=axis1); z always full
    tx0 = jnp.floor(lo[:, 0] / ty_).astype(jnp.int32)
    ty0v = jnp.floor(lo[:, 1] / tx_).astype(jnp.int32)
    tx1 = jnp.floor((hi[:, 0] - 1.0) / ty_).astype(jnp.int32)
    ty1v = jnp.floor((hi[:, 1] - 1.0) / tx_).astype(jnp.int32)
    keys, payload = [], []
    eid = jnp.arange(e, dtype=jnp.int32)
    for sx in range(span_[0]):
        for sy in range(span_[1]):
            rx = tx0 + sx
            ry = ty0v + sy
            live = ((rx <= tx1) & (ry <= ty1v) & (rx >= 0) & (rx < nty)
                    & (ry >= 0) & (ry < ntx) & valid
                    & (hi[:, 2] > 0) & (lo[:, 2] < Z))
            keys.append(jnp.where(live, rx * ntx + ry, n_tiles))
            payload.append(eid)
    keys = jnp.concatenate(keys)
    payload = jnp.concatenate(payload)
    keys, payload = jax.lax.sort_key_val(keys, payload)

    tgrid = jnp.arange(n_tiles + 1, dtype=jnp.int32)
    starts = jnp.searchsorted(keys, tgrid, side="left").astype(jnp.int32)
    counts = jnp.minimum(starts[1:] - starts[:-1], k).astype(jnp.int32)

    slot = jnp.arange(k, dtype=jnp.int32)
    src = jnp.minimum(starts[:-1, None] + slot[None, :], keys.shape[0] - 1)
    idx = payload[src]                                   # [nt, k]

    ga, gb, gr = a[idx], b[idx], radius[idx]
    glo, ghi = lo[idx], hi[idx]
    seg = gb - ga
    invd = 1.0 / jnp.maximum(jnp.sum(seg * seg, -1), 1e-12)
    z16 = jnp.zeros_like(gr)
    packed = jnp.stack(
        [ga[..., 0], ga[..., 1], ga[..., 2],
         seg[..., 0], seg[..., 1], seg[..., 2],
         invd, gr,
         glo[..., 0], glo[..., 1], glo[..., 2],
         ghi[..., 0], ghi[..., 1], ghi[..., 2],
         z16, z16], -1)                                   # [nt, k, 16]

    t_lin = jnp.arange(n_tiles, dtype=jnp.int32)
    rowcol = jnp.stack(
        [(t_lin // ntx) * ty_, (t_lin % ntx) * tx_], -1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, k, 16), lambda i, c, rc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Z, ty_, tx_), lambda i, c, rc: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Z, ty_, tx_), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_splat3d_tile_kernel, ty=ty_, tx=tx_, zdim=Z),
        out_shape=jax.ShapeDtypeStruct((n_tiles, Z, ty_, tx_), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(counts, rowcol, packed)

    vol = out.reshape(nty, ntx, Z, ty_, tx_).transpose(0, 3, 1, 4, 2)
    vol = vol.reshape(nty * ty_, ntx * tx_, Z)[:X, :Y, :]
    return jnp.clip(vol, 0.0, 1.0)
