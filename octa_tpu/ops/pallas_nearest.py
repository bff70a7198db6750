"""Pallas TPU kernel for masked nearest-neighbor distance queries.

This is the hot op of the vessel-growth engine (the reference uses a
`scipy.spatial.cKDTree` rebuilt on every insert,
``vessel_graph_generation/element_mesh.py:97-101``; our XLA fallback is the
chunked scan in :mod:`octa_tpu.sim.greenhouse`). The XLA form materializes the
[Q, chunk] pairwise-d² matrix to HBM and — with two validity masks — reads it
back once per masked reduction, which makes the growth loop HBM-bound. The
kernel keeps each d² tile in VMEM, computes d² per point block as three VPU
difference-form FMAs (a K=3 matmul would be padded to K=128 on the MXU), and
carries the running (min, argmin) of every mask across point blocks, so HBM
traffic collapses to the inputs and the [Q]-sized outputs.

d² is the EXACT difference form ``Σ_a (q_a - p_a)²`` — not the expanded
``|q|²+|p|²-2q·p``, which cancels catastrophically in f32 for pairs much
closer than their norms and can flip accept/satisfy decisions near the
eps/delta thresholds (the retired docs/PARITY.md §2.1 caveat; the
reference's cKDTree distances are exact). In VMEM the difference form
costs only ~2 extra VPU passes per block — the expanded form's only
advantage (avoiding a [Q, chunk, 3] HBM intermediate) is moot here.

Masks are passed as additive penalties: ``pen = BIG * (1 - mask)``, so
``d² + pen`` is one add per mask and invalid points sort to ~1e30
(callers treat sqrt(1e30) as "no neighbor"). With ``OCTA_TPU_PEN_BF16=1``
(read at trace time) the penalty array is bf16 — its only values, 0.0 and
~BIG, need no mantissa, and bf16 halves the [R, M, N] HBM write+read the
materialized input costs per call, upcasting to f32 on the in-kernel add.
"""
from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _nearest_kernel(q_ref, pt_ref, pen_ref, *out_refs, n_blk: int,
                    blk: int, n_masks: int, want_idx: bool):
    """One grid step = one (row, query-tile).

    q_ref:   [1, TQ, 3] f32 — query tile.
    pt_ref:  [1, 3, N]  f32 — transposed points for this row (whole).
    pen_ref: [1, M, N]  f32 — per-mask additive penalties (BIG·invalid).
    out_refs: per mask, d² [1, TQ] f32 (+ argmin idx [1, TQ] i32 when
    ``want_idx``).
    """
    q = q_ref[0]                                  # [TQ, 3]
    tq = q.shape[0]

    qa = [q[:, a] for a in range(3)]

    def body(j, carry):
        # Exact difference-form d² as 3 VPU outer sub+FMA pairs, NOT a
        # dot_general: Mosaic pads a K=3 matmul to K=128 on the MXU (43x
        # wasted work) — measured 161 ms vs 59 ms per growth-shaped call
        # ([32,3,10240]x16384 in the expanded form; the difference form
        # adds ~2 VPU passes and removes the f32 cancellation).
        p0 = pt_ref[0, 0, pl.ds(j * blk, blk)]
        p1 = pt_ref[0, 1, pl.ds(j * blk, blk)]
        p2 = pt_ref[0, 2, pl.ds(j * blk, blk)]
        d0 = qa[0][:, None] - p0[None, :]
        d1 = qa[1][:, None] - p1[None, :]
        d2_ = qa[2][:, None] - p2[None, :]
        base = d0 * d0 + d1 * d1 + d2_ * d2_      # [TQ, blk]
        new = []
        for m in range(n_masks):
            # pen arrives bf16 (halves its HBM write+read per call — the
            # values are only 0.0 and BIG, both exact in bf16) and
            # upcasts on the VPU add.
            pen = pen_ref[0, m, pl.ds(j * blk, blk)].astype(jnp.float32)
            dm = base + pen[None, :]
            bmin = jnp.min(dm, axis=1)
            if want_idx:
                iota = jax.lax.broadcasted_iota(jnp.int32, (tq, blk), 1)
                bidx = jnp.min(
                    jnp.where(dm <= bmin[:, None], iota, blk), axis=1
                ) + j * blk
            cd = carry[2 * m] if want_idx else carry[m]
            upd = bmin < cd
            if want_idx:
                ci = carry[2 * m + 1]
                new += [jnp.where(upd, bmin, cd), jnp.where(upd, bidx, ci)]
            else:
                new.append(jnp.where(upd, bmin, cd))
        return tuple(new)

    init = []
    for _ in range(n_masks):
        init.append(jnp.full((tq,), jnp.inf, jnp.float32))
        if want_idx:
            init.append(jnp.zeros((tq,), jnp.int32))
    res = jax.lax.fori_loop(0, n_blk, body, tuple(init))
    for r, ref in zip(res, out_refs):
        ref[0, 0, 0] = r


@functools.partial(
    jax.jit,
    static_argnames=("want_idx", "tq", "blk", "interpret"),
)
def masked_nearest_pallas(query, points, masks, *, want_idx: bool = True,
                          tq: int = 128, blk: int = 8192,
                          interpret: bool = False):
    """Masked nearest-neighbor distances (Pallas TPU kernel).

    query:  [R, Q, 3] f32 — query positions, R independent rows.
    points: [R, N, 3] f32 — candidate points per row.
    masks:  [R, M, N] bool — M validity masks per row; each mask yields its
            own minima.

    Returns (d [R, M, Q] — true euclidean distance, huge (~1e15) where no
    valid point; idx [R, M, Q] i32 argmin when ``want_idx``).
    """
    r, qn = query.shape[0], query.shape[1]
    n = points.shape[1]
    m = masks.shape[1]
    blk = min(blk, max(256, 1 << (n - 1).bit_length()))
    # Zero-padding beats big blocks: capacity staging sizes N in 2048
    # multiples, and padding N up to a multiple of blk is pure wasted VPU
    # work (N=10240 with blk=8192 pads to 16384 — +60%). Use the largest
    # block that divides N exactly, down to 2048; only below that accept
    # padding.
    if n > 2048:
        for cand_blk in (8192, 4096, 2048):
            if cand_blk <= blk and n % cand_blk == 0:
                blk = cand_blk
                break
        else:
            blk = min(blk, 2048)
    q_pad = _cdiv(qn, tq) * tq
    n_pad = _cdiv(n, blk) * blk
    query = jnp.pad(query.astype(jnp.float32), ((0, 0), (0, q_pad - qn),
                                                (0, 0)))
    pts = jnp.pad(points.astype(jnp.float32), ((0, 0), (0, n_pad - n),
                                               (0, 0)))
    # bf16 penalties (0.0 and ~BIG are exact in bf16) halve the mask
    # input's HBM write+read. Gated until the Mosaic lowering is
    # A/B-validated on hardware — the f32 default is the proven path.
    pen_dt = (jnp.bfloat16 if _os.environ.get("OCTA_TPU_PEN_BF16") == "1"
              else jnp.float32)
    pen = jnp.where(
        jnp.pad(masks, ((0, 0), (0, 0), (0, n_pad - n))),
        pen_dt(0.0), pen_dt(BIG))
    pts_t = jnp.swapaxes(pts, 1, 2)               # [R, 3, N]

    n_q_tiles = q_pad // tq
    n_blk = n_pad // blk
    # The trailing singleton keeps the block's last two dims equal to the
    # array's (Mosaic requires (8,128)-divisible or full-dim blocks), and
    # stays correct under vmap (batching prepends dims to both).
    outs = []
    for _ in range(m):
        outs.append(
            jax.ShapeDtypeStruct((r, n_q_tiles, 1, tq), jnp.float32))
        if want_idx:
            outs.append(
                jax.ShapeDtypeStruct((r, n_q_tiles, 1, tq), jnp.int32))
    out_specs = []
    for _ in range(len(outs)):
        out_specs.append(
            pl.BlockSpec((1, 1, 1, tq), lambda ri, qi: (ri, qi, 0, 0),
                         memory_space=pltpu.VMEM))

    res = pl.pallas_call(
        functools.partial(_nearest_kernel, n_blk=n_blk, blk=blk,
                          n_masks=m, want_idx=want_idx),
        grid=(r, n_q_tiles),
        in_specs=[
            pl.BlockSpec((1, tq, 3), lambda ri, qi: (ri, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n_pad), lambda ri, qi: (ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, n_pad), lambda ri, qi: (ri, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=outs,
        interpret=interpret,
    )(query, pts_t, pen)

    res = [x.reshape(r, 1, q_pad)[:, :, :qn] for x in res]
    if want_idx:
        d = jnp.concatenate(res[0::2], axis=1)
        i = jnp.concatenate(res[1::2], axis=1)
        d = jnp.sqrt(jnp.maximum(d, 0.0))
        return d, jnp.minimum(i, n - 1)
    d = jnp.concatenate(res, axis=1)
    return jnp.sqrt(jnp.maximum(d, 0.0))


# ---------------------------------------------------------------------------
# Banded variant: spatially-pruned point blocks
# ---------------------------------------------------------------------------

def _banded_kernel(ylo_ref, yhi_ref, plo_ref, phi_ref, q_ref, pt_ref,
                   pen_ref, *out_refs, n_blk: int, blk: int,
                   want_idx: bool):
    """Banded nearest kernel: one grid step = one (row, query-tile), M=1.

    Identical math to ``_nearest_kernel`` except each point block ``j`` is
    predicated on a y-interval overlap test: the caller guarantees every
    consumer of the result only uses distances ``<= band`` (the per-query
    bounds ylo/yhi already carry the ±band margin), so a block whose point
    y-range cannot intersect the tile's banded y-range contributes only
    pairs with d > band and may be skipped EXACTLY — the skipped pairs sort
    to +inf, above every in-band distance. This turns the VPU work from
    Q x N into Q x (nodes within the band), ~4x less late in DVC when the
    arrays are y-sorted (see greenhouse._restage_spatial).

    ylo/yhi: [1, 1, 1, TQ] f32 — per-query banded y bounds (dead queries
             carry +inf/-inf); the tile range is an in-kernel min/max, so
             no grid-index arithmetic is needed (vmap prepends grid dims).
    plo/phi: [1, 1, n_blk] f32 in SMEM — per-point-block y-range.
    """
    lo = jnp.min(ylo_ref[0, 0, 0])
    hi = jnp.max(yhi_ref[0, 0, 0])
    q = q_ref[0]                                  # [TQ, 3]
    tq = q.shape[0]
    qa = [q[:, a] for a in range(3)]

    def body(j, carry):
        hit = (phi_ref[0, 0, j] >= lo) & (plo_ref[0, 0, j] <= hi)

        def compute(c):
            p0 = pt_ref[0, 0, pl.ds(j * blk, blk)]
            p1 = pt_ref[0, 1, pl.ds(j * blk, blk)]
            p2 = pt_ref[0, 2, pl.ds(j * blk, blk)]
            d0 = qa[0][:, None] - p0[None, :]
            d1 = qa[1][:, None] - p1[None, :]
            d2_ = qa[2][:, None] - p2[None, :]
            base = d0 * d0 + d1 * d1 + d2_ * d2_  # [TQ, blk]
            pen = pen_ref[0, 0, pl.ds(j * blk, blk)].astype(jnp.float32)
            dm = base + pen[None, :]
            bmin = jnp.min(dm, axis=1)
            cd = c[0]
            upd = bmin < cd
            if want_idx:
                iota = jax.lax.broadcasted_iota(jnp.int32, (tq, blk), 1)
                bidx = jnp.min(
                    jnp.where(dm <= bmin[:, None], iota, blk), axis=1
                ) + j * blk
                return (jnp.where(upd, bmin, cd),
                        jnp.where(upd, bidx, c[1]))
            return (jnp.where(upd, bmin, cd),)

        return jax.lax.cond(hit, compute, lambda c: c, carry)

    init = (jnp.full((tq,), jnp.inf, jnp.float32),)
    if want_idx:
        init += (jnp.zeros((tq,), jnp.int32),)
    res = jax.lax.fori_loop(0, n_blk, body, init)
    for rr, ref in zip(res, out_refs):
        ref[0, 0, 0] = rr


@functools.partial(
    jax.jit,
    static_argnames=("want_idx", "tq", "blk", "interpret"),
)
def masked_nearest_banded_pallas(query, points, masks, q_alive, band, *,
                                 want_idx: bool = True, tq: int = 128,
                                 blk: int = 1024, interpret: bool = False):
    """Masked nearest neighbors with banded point-block pruning.

    Exactness contract: for every query marked in ``q_alive``, any point
    within euclidean distance ``band[r]`` of it gets an exact (d, idx);
    results beyond ``band`` may be reported as "no neighbor" (huge d).
    Callers must only consume the result under a ``d <= bound`` predicate
    with ``bound <= band[r]`` (the growth loop's delta/eps_k gates).
    Queries NOT in ``q_alive`` may return garbage (+inf-ish) — callers gate
    on aliveness already. The pruning pays when ``points`` arrive y-sorted
    (greenhouse restages arrays between growth segments); unsorted inputs
    simply degrade to a full scan.

    query:   [R, Q, 3] f32; points: [R, N, 3] f32; masks: [R, 1, N] bool.
    q_alive: [R, Q] bool — queries whose results are consumed.
    band:    [R] f32 — per-row exactness radius (traced OK).
    Returns (d [R, 1, Q], idx [R, 1, Q]) like ``masked_nearest_pallas``.
    """
    r, qn = query.shape[0], query.shape[1]
    n = points.shape[1]
    # smaller blocks than the full-scan kernel: pruning granularity is the
    # block, and capacities are 2048-multiples, so 1024 always divides N
    if n % blk != 0:
        blk = min(blk, max(256, 1 << (n - 1).bit_length()))
        while n % blk and blk > 256:
            blk //= 2
    q_pad = _cdiv(qn, tq) * tq
    n_pad = _cdiv(n, blk) * blk
    query = jnp.pad(query.astype(jnp.float32), ((0, 0), (0, q_pad - qn),
                                                (0, 0)))
    alive = jnp.pad(q_alive, ((0, 0), (0, q_pad - qn)))
    pts = jnp.pad(points.astype(jnp.float32), ((0, 0), (0, n_pad - n),
                                               (0, 0)))
    valid = jnp.pad(masks[:, 0, :], ((0, 0), (0, n_pad - n)))
    pen = jnp.where(valid, jnp.float32(0.0), jnp.float32(BIG))[:, None, :]
    pts_t = jnp.swapaxes(pts, 1, 2)               # [R, 3, N]

    n_q_tiles = q_pad // tq
    n_blk = n_pad // blk

    # per-query banded y bounds (dead/pad queries carry +inf/-inf so an
    # all-dead tile gets lo=+inf/hi=-inf in-kernel and skips every block)
    qy = query[:, :, 1]
    ylo = jnp.where(alive, qy - band[:, None], jnp.inf)
    yhi = jnp.where(alive, qy + band[:, None], -jnp.inf)
    ylo = ylo.reshape(r, n_q_tiles, 1, tq)
    yhi = yhi.reshape(r, n_q_tiles, 1, tq)
    # per-block point y-range over valid points (an all-invalid block gets
    # plo=+inf/phi=-inf and is skipped by every tile)
    py = pts[:, :, 1].reshape(r, n_blk, blk)
    vblk = valid.reshape(r, n_blk, blk)
    plo = jnp.min(jnp.where(vblk, py, jnp.inf), axis=2)[:, None, :]
    phi = jnp.max(jnp.where(vblk, py, -jnp.inf), axis=2)[:, None, :]

    outs = [jax.ShapeDtypeStruct((r, n_q_tiles, 1, tq), jnp.float32)]
    if want_idx:
        outs.append(jax.ShapeDtypeStruct((r, n_q_tiles, 1, tq), jnp.int32))
    out_specs = [
        pl.BlockSpec((1, 1, 1, tq), lambda ri, qi: (ri, qi, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in outs]

    res = pl.pallas_call(
        functools.partial(_banded_kernel, n_blk=n_blk, blk=blk,
                          want_idx=want_idx),
        grid=(r, n_q_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, 1, tq), lambda ri, qi: (ri, qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, tq), lambda ri, qi: (ri, qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_blk), lambda ri, qi: (ri, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_blk), lambda ri, qi: (ri, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tq, 3), lambda ri, qi: (ri, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n_pad), lambda ri, qi: (ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda ri, qi: (ri, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=outs,
        interpret=interpret,
    )(ylo, yhi, plo, phi, query, pts_t, pen)

    res = [x.reshape(r, 1, q_pad)[:, :, :qn] for x in res]
    d = jnp.sqrt(jnp.maximum(res[0], 0.0))
    if want_idx:
        return d, jnp.minimum(res[1], n - 1)
    return d
