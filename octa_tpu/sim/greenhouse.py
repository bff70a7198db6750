"""Batched, jit-compiled space-colonization vessel growth.

TPU-native rebuild of the reference's Greenhouse
(``vessel_graph_generation/greenhouse.py``): instead of anytree pointer
nodes + a cKDTree rebuilt on every insert (``element_mesh.py:97-101``), the
forest is a fixed-capacity structure-of-arrays and every step is a masked,
vectorized computation:

- oxygen-sink sampling with the Schneider-2012 oxygen heuristic
  (``greenhouse.py:309-341``), mutual eps_s spacing via a blocked greedy
  accept (16 sequential blocks instead of 2000 sequential candidates),
- nearest-active-node attraction assignment as chunked distance minima
  (``greenhouse.py:343-366``),
- per-node growth: leaf elongation with the FAZ rotation field, Murray-law
  bifurcation with a power-iteration PCA split direction, and Rodrigues
  inter-node sprouting (``greenhouse.py:157-307``),
- Murray radius back-propagation as parallel scatter-add sweeps
  (``arterial_tree.py:174-184``),
- simulation-space expansion by rescaling the distance parameters
  (``greenhouse.py:139-155``).

One ``lax.fori_loop`` iteration grows both forests; ``jax.vmap`` over the
batch axis grows many independent samples per chip. The irreducible
sequential dependency is across iterations only.
"""
from __future__ import annotations

import functools
import math
import os as _os
import warnings as _warnings
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from octa_tpu.ops.pallas_nearest import (masked_nearest_banded_pallas,
                                         masked_nearest_pallas)
from octa_tpu.ops.pallas_segsum import segsum_onehot_pallas

GEOMETRY_SIZE = 76


def _use_pallas() -> bool:
    """Nearest-neighbor scans run as a Pallas kernel on TPU (VMEM-resident d²
    tiles, VPU outer-product cross term); the XLA chunked scan is the
    CPU/test path. "axon" is the tunneled-TPU backend name."""
    return jax.default_backend() in ("tpu", "axon")


def _banded() -> bool:
    """Spatially-banded nearest scans (the cKDTree-role pruning,
    reference ``element_mesh.py:87-218``): node/sink arrays are y-sorted at
    segment staging (``_restage_spatial``), sink appends fill tail-most
    free slots so the sorted prefix stays coherent, and the main
    per-iteration scan skips point blocks outside each query tile's
    ±delta y-band (``ops.pallas_nearest.masked_nearest_banded_pallas``).
    Exact for every consumer (all are d <= delta/eps gated).
    Off by default until the TPU A/B lands (OCTA_TPU_BANDED=1)."""
    return _os.environ.get("OCTA_TPU_BANDED", "0") == "1"


# ---------------------------------------------------------------------------
# State
# ---------------------------------------------------------------------------

class ForestState(NamedTuple):
    pos: jax.Array          # [NC, 3]
    radius: jax.Array       # [NC]
    parent: jax.Array       # [NC] int32, -1 for roots/empty
    first_child: jax.Array  # [NC] int32, -1 if none
    n_children: jax.Array   # [NC] int32
    is_root: jax.Array      # [NC] bool
    n_nodes: jax.Array      # scalar int32
    # Per-node Murray exponents, fixed at creation (reference
    # ``arterial_tree.py:9,32,180``: every Node stores the kappa it was
    # created with — the current mode's for grown nodes, the Node default
    # 4 for stump/root nodes — and ``optimize_edge_radius_to_root`` uses
    # the PARENT node's own kappa for both the child sum and the 1/kappa).
    kappa: jax.Array        # [NC] f32 — this node's creation kappa
    pkappa: jax.Array       # [NC] f32 — the parent's kappa (at creation)


class SinkState(NamedTuple):
    pos: jax.Array    # [SC, 3]
    alive: jax.Array  # [SC] bool


class GrowthState(NamedTuple):
    art: ForestState
    ven: ForestState
    oxy: SinkState
    co2: SinkState
    sigma_t: jax.Array
    d_cur: jax.Array       # current inter-node distance (compounds per mode)
    d_start: jax.Array     # d at the current mode's entry (fixed per mode)
    faz_radius: jax.Array  # per-sim sampled FAZ radius (sim units)
    key: jax.Array
    sat: jax.Array         # int32 bitmask: 1 = emission/append window hit,
    #                        2 = sink-capacity hit (driver redoes the segment)


class StackedState(NamedTuple):
    """Iteration-internal state with arterial/venous forests stacked on a
    leading axis of 2 (row 0 = arterial + oxygen sinks, row 1 = venous +
    CO2 sources), so every per-forest op chain is issued once instead of
    twice — op count, not FLOPs, bounds the growth loop on this backend."""
    forests: ForestState  # arrays [2, NC, ...], n_nodes [2]
    sinks: SinkState      # pos [2, SC, 3], alive [2, SC]
    sigma_t: jax.Array
    d_cur: jax.Array
    d_start: jax.Array
    faz_radius: jax.Array
    key: jax.Array
    sat: jax.Array


def _stack_state(s: GrowthState) -> StackedState:
    f = jax.tree.map(lambda a, v: jnp.stack([a, v]), s.art, s.ven)
    sk = jax.tree.map(lambda a, v: jnp.stack([a, v]), s.oxy, s.co2)
    return StackedState(f, sk, s.sigma_t, s.d_cur, s.d_start,
                        s.faz_radius, s.key, s.sat)


def _unstack_state(s: StackedState) -> GrowthState:
    art = jax.tree.map(lambda x: x[0], s.forests)
    ven = jax.tree.map(lambda x: x[1], s.forests)
    oxy = jax.tree.map(lambda x: x[0], s.sinks)
    co2 = jax.tree.map(lambda x: x[1], s.sinks)
    return GrowthState(art, ven, oxy, co2, s.sigma_t, s.d_cur, s.d_start,
                       s.faz_radius, s.key, s.sat)


class ModeParams(NamedTuple):
    """Static per-mode parameters. eps/delta are the RAW config values: the
    reference uses them *undivided* on the first iteration of each mode and
    only applies /(param_scale * sigma_t) after the first expansion
    (``greenhouse.py:34-51,139-147`` — init_params_from_config stores raw
    values; orig_scale divides by param_scale; sigma resets per mode)."""
    I: int
    N: int
    eps_n: float
    eps_s: float
    eps_k: float
    delta_art: float
    delta_ven: float
    gamma_art: float
    gamma_ven: float
    phi: float
    omega: float
    kappa: float
    delta_sigma: float
    first_mode: bool


# ---------------------------------------------------------------------------
# Geometry helpers
# ---------------------------------------------------------------------------

def _norm(v, axis=-1, eps=1e-12):
    return v / (jnp.linalg.norm(v, axis=axis, keepdims=True) + eps)


def _angle_deg(u, v, axis=-1):
    """Angle in degrees between vectors (reference utilities
    ``get_angle_between_vectors``)."""
    un = _norm(u, axis)
    vn = _norm(v, axis)
    cos = jnp.clip(jnp.sum(un * vn, axis=axis), -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def _oxygen_distance(r, param_scale):
    """Schneider-2012 oxygen concentration heuristic
    (``greenhouse.py:309-317``)."""
    c_oxygen = 203.9e-3
    kappa = 0.02 * c_oxygen
    r0 = 3.5e-3
    x = r * param_scale / r0
    c1 = kappa * x * jnp.exp(1.0 - x)
    return c1 * 6.0 / param_scale


def _chunked_nearest(query, points, valid, chunk=2048, n_valid=None):
    """(min_dist, argmin) from each query [Q,3] to valid points [NC,3].

    The pairwise d² is the EXACT difference form ``Σ_a (q_a - p_a)²``,
    built coordinate-at-a-time so only [Q, chunk] intermediates exist (the
    [Q, chunk, 3] broadcast-diff would be HBM-bound). The expanded
    ``|q|²+|p|²-2q·p`` form cancels catastrophically in f32 for pairs much
    closer than their norms and could flip accept/satisfy decisions near
    the eps/delta thresholds (retired docs/PARITY.md §2.1 caveat; the
    reference's cKDTree distances are exact).

    ``n_valid`` is accepted for API stability but intentionally unused: see
    the NOTE below — the live node count is bounded by capacity staging in
    ``develop_forest`` instead of a dynamic trip count."""
    nc = points.shape[0]
    n_chunks = -(-nc // chunk)
    pad = n_chunks * chunk - nc
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    val = jnp.pad(valid, (0, pad))
    pts_c = pts.reshape(n_chunks, chunk, 3)
    val_c = val.reshape(n_chunks, chunk)

    def body(carry, inp):
        best_d2, best_i = carry
        p, v, base = inp
        d2 = sum((query[:, a, None] - p[None, :, a]) ** 2 for a in range(3))
        d2 = jnp.where(v[None, :], d2, jnp.inf)
        dmin = jnp.min(d2, axis=1)
        imin = jnp.argmin(d2, axis=1) + base
        upd = dmin < best_d2
        return (jnp.where(upd, dmin, best_d2),
                jnp.where(upd, imin, best_i)), None

    init = (jnp.full((query.shape[0],), jnp.inf),
            jnp.zeros((query.shape[0],), jnp.int32))
    # NOTE: a dynamic trip count (fori_loop bounded by ceil(n_valid/chunk))
    # is 7x SLOWER on the axon backend (while-op overhead dominates), so the
    # scan visits all chunks; capacity staging in develop_forest bounds NC.
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (d2, i), _ = jax.lax.scan(body, init, (pts_c, val_c, bases))
    return jnp.sqrt(jnp.maximum(d2, 0.0)), i


def _chunked_min_dist_subset(query, points, valid, chunk=2048, n_valid=None):
    d, _ = _chunked_nearest(query, points, valid, chunk, n_valid=n_valid)
    return d


def _chunked_nearest2(query, points, mask_a, mask_b, chunk=512):
    """Two-mask nearest: one pass over the pairwise d² matrix yields minima
    under two different point-validity masks — (dA, iA, dB, iB). Not on the
    production path (the loop uses single-mask calls sized so every lane is
    consumed); retained as the multi-mask CPU oracle for the Pallas kernel
    tests (``tests/test_pallas_nearest.py``)."""
    nc = points.shape[0]
    n_chunks = -(-nc // chunk)
    pad = n_chunks * chunk - nc
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    va = jnp.pad(mask_a, (0, pad))
    vb = jnp.pad(mask_b, (0, pad))

    def body(carry, inp):
        da, ia, db, ib = carry
        p, a, b, base = inp
        d2 = sum((query[:, c, None] - p[None, :, c]) ** 2 for c in range(3))
        out = []
        for bd, bi, m in ((da, ia, a), (db, ib, b)):
            dm = jnp.where(m[None, :], d2, jnp.inf)
            dmin = jnp.min(dm, axis=1)
            imin = jnp.argmin(dm, axis=1) + base
            upd = dmin < bd
            out += [jnp.where(upd, dmin, bd), jnp.where(upd, imin, bi)]
        return tuple(out), None

    q0 = jnp.full((query.shape[0],), jnp.inf)
    i0 = jnp.zeros((query.shape[0],), jnp.int32)
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (da, ia, db, ib), _ = jax.lax.scan(
        body, (q0, i0, q0, i0),
        (pts.reshape(n_chunks, chunk, 3), va.reshape(n_chunks, chunk),
         vb.reshape(n_chunks, chunk), bases))

    def _d(x):
        return jnp.sqrt(jnp.maximum(x, 0.0))

    return _d(da), ia, _d(db), ib


# ---------------------------------------------------------------------------
# Oxygen sink sampling
# ---------------------------------------------------------------------------

def _sample_candidates(key, n_cand, faz_center, faz_radius_sim, size_z,
                       nerve_center=None, nerve_radius=0.0, geometry=None):
    """Candidate sink positions: jittered voxels of the 76x76x1 grid with the
    FAZ disc (and optionally the optic-nerve disc) carved out
    (``simulation_space.py:36-54``; the validity test is evaluated
    per-candidate instead of materializing the voxel list). When a
    ``geometry`` boolean voxel mask is given (``oxygen_sample_geometry_path``
    configs), validity comes from the mask lookup instead."""
    k1, k2 = jax.random.split(key)
    gsize = GEOMETRY_SIZE if geometry is None else max(geometry.shape)
    vox = jax.random.randint(k1, (n_cand, 2), 0, gsize)
    jitter = jax.random.uniform(k2, (n_cand, 3))
    if geometry is not None:
        gx = jnp.clip(vox[:, 0], 0, geometry.shape[0] - 1)
        gy = jnp.clip(vox[:, 1], 0, geometry.shape[1] - 1)
        valid = geometry[gx, gy]
    else:
        # reference: (x - cx)^2 + (y - cy)^2 > (faz_r*G*0.5)^2 on voxels
        cx = faz_center[0] * gsize
        cy = faz_center[1] * gsize
        rr = faz_radius_sim * gsize * 0.5
        valid = ((vox[:, 0] - cx) ** 2 + (vox[:, 1] - cy) ** 2) > rr**2
        if nerve_center is not None:
            # optic-nerve carving (``simulation_space.py:45-49``), applied
            # when the nerve disc intersects the unit space
            ncx = nerve_center[0] * gsize
            ncy = nerve_center[1] * gsize
            nrr = nerve_radius * gsize
            valid &= ((vox[:, 0] - ncx) ** 2
                      + (vox[:, 1] - ncy) ** 2) > nrr**2
    pos = jnp.concatenate(
        [(vox.astype(jnp.float32) + jitter[:, :2]) / gsize,
         (jitter[:, 2:3] * size_z * gsize) / gsize], axis=-1)
    return pos, valid


def _blocked_greedy_spacing(pos, valid, eps_s, n_blocks=64):
    """Accept candidates in order; a candidate is rejected if it conflicts
    (dist <= eps_s) with an accepted earlier candidate. Processed in
    ``n_blocks`` sequential blocks; within a block the conservative rule
    (conflict with any earlier *valid* candidate) is used — a close, slightly
    stricter approximation of the reference's fully sequential greedy
    (``greenhouse.py:334-340``)."""
    n = pos.shape[0]
    bs = -(-n // n_blocks)
    pad = n_blocks * bs - n
    pos_p = jnp.pad(pos, ((0, pad), (0, 0)))
    val_p = jnp.pad(valid, (0, pad))
    pos_b = pos_p.reshape(n_blocks, bs, 3)
    val_b = val_p.reshape(n_blocks, bs)
    acc_mask0 = jnp.zeros((n_blocks * bs,), bool)

    def scan_body(carry, i):
        acc_mask = carry
        p = pos_b[i]
        v = val_b[i]
        d_prev = jnp.linalg.norm(
            p[:, None, :] - pos_p[None, :, :], axis=-1)
        conflict_prev = jnp.any((d_prev <= eps_s) & acc_mask[None, :], axis=1)
        d_intra = jnp.linalg.norm(p[:, None, :] - p[None, :, :], axis=-1)
        earlier = jnp.tril(jnp.ones((bs, bs), bool), k=-1)
        conflict_intra = jnp.any(
            (d_intra <= eps_s) & earlier & v[None, :], axis=1)
        accept = v & ~conflict_prev & ~conflict_intra
        acc_mask = jax.lax.dynamic_update_slice(acc_mask, accept, (i * bs,))
        return acc_mask, None

    acc_mask, _ = jax.lax.scan(scan_body, acc_mask0,
                               jnp.arange(n_blocks, dtype=jnp.int32))
    return acc_mask[:n]


def _append_sinks(sinks: SinkState, pos, accept, max_append=2048):
    """Place accepted candidates into free sink slots (both in index order).

    XLA scatter/gather cost on this backend is ~dozens of ns *per index*, so
    the budget is index count: compact the (few) accepted candidates and the
    free slots they go to with two ``compare_all`` prefix-sum inversions
    (branchless [K, n] compare+sum — no serial scan), then scatter only
    ``max_append`` rows. Returns (state, sat_window, sat_capacity):
    ``sat_window`` trips the caller's segment redo with a doubled append
    window; ``sat_capacity`` trips a redo with a larger sink array (the
    reference's sink list is unbounded, ``greenhouse.py:319-341`` — staged
    capacity keeps results identical to an unbounded run as long as the
    driver re-runs saturated segments)."""
    sc = sinks.pos.shape[0]
    sq = pos.shape[0]
    k = min(max_append, sq)
    cum_acc = jnp.cumsum(accept.astype(jnp.int32))        # [Sq]
    n_acc = cum_acc[-1]
    r = jnp.arange(k, dtype=jnp.int32)
    cand_idx = jnp.clip(
        jnp.searchsorted(cum_acc, r, side="right", method="compare_all"),
        0, sq - 1)                                        # r-th accept
    free = ~sinks.alive
    if _banded():
        # fill TAIL-MOST free slots first: after a segment-boundary
        # restage (alive prefix y-sorted, free slots at the tail) this
        # keeps the sorted prefix spatially coherent for the banded scans
        # — interior holes from deaths are only recycled once the tail is
        # exhausted. The placed SET of sinks is identical either way;
        # only slot assignment (and thus f32 reduction order) changes.
        cum_free_r = jnp.cumsum(free[::-1].astype(jnp.int32))
        n_free = cum_free_r[-1]
        slot_idx = sc - 1 - jnp.clip(
            jnp.searchsorted(cum_free_r, r, side="right",
                             method="compare_all"),
            0, sc - 1)                                    # r-th-from-end
    else:
        cum_free = jnp.cumsum(free.astype(jnp.int32))     # [SC]
        n_free = cum_free[-1]
        slot_idx = jnp.clip(
            jnp.searchsorted(cum_free, r, side="right",
                             method="compare_all"),
            0, sc - 1)                                    # r-th free slot
    place = (r < n_acc) & (r < n_free)
    tgt = jnp.where(place, slot_idx, sc)
    posal = jnp.concatenate(
        [sinks.pos, sinks.alive[:, None].astype(jnp.float32)], -1)
    upd = jnp.concatenate(
        [pos[cand_idx], jnp.ones((k, 1), jnp.float32)], -1)
    # NOT unique_indices: every non-placed row shares the dropped sentinel
    # index sc, which would violate the uniqueness contract
    posal = posal.at[tgt].set(upd, mode="drop")
    return (SinkState(posal[:, :3], posal[:, 3] > 0.5),
            n_acc > k, jnp.minimum(n_acc, k) > n_free)


# ---------------------------------------------------------------------------
# Growth
# ---------------------------------------------------------------------------

def _power_iteration_3x3(M, iters=24):
    """Principal eigenvector of symmetric 3x3 matrices [N, 3, 3]. Unrolled
    (trace-time loop): the iterates are tiny elementwise chains that XLA
    fuses, whereas a fori_loop would pay while-op overhead per step."""
    v = jnp.broadcast_to(
        jnp.asarray([0.6, 0.7, 0.38], jnp.float32), M.shape[:-2] + (3,))
    for _ in range(iters):
        v = _norm(jnp.einsum("...ij,...j->...i", M, v))
    return v


def _rodrigues(v, axis, theta_deg):
    th = jnp.radians(theta_deg)[..., None]
    cos, sin = jnp.cos(th), jnp.sin(th)
    return (v * cos + jnp.cross(axis, v) * sin
            + axis * jnp.sum(axis * v, axis=-1, keepdims=True) * (1 - cos))


def _grow_core(forest: ForestState, sink_pos, sink_alive, dist, idx, *,
               gamma, delta, d, r, kappa, phi, omega, faz_center, faz_radius,
               rotation_radius, first_mode, t, key, murray_sweeps=8,
               new_cap=1024):
    """One growth pass for one forest; the attraction assignment
    (``dist, idx`` = nearest active node per sink) is computed by the caller
    in a fused multi-row scan. Returns (forest', new_node_window).

    Gathers are fused through per-node feature tables and the six segment
    sums share one 18-feature scatter-add: per-op fixed cost dominates this
    backend, so the design target is the number of scatter/gather ops."""
    nc = forest.pos.shape[0]

    assigned = jnp.where(sink_alive & (dist <= delta), idx, -1)
    has_assign = assigned >= 0
    aidx = jnp.clip(assigned, 0, nc - 1)

    # node-level gathered tables (2 gathers), then one per-sink gather
    par = jnp.clip(forest.parent, 0, nc - 1)
    child = jnp.clip(forest.first_child, 0, nc - 1)
    pos_par = forest.pos[par]                                    # [NC,3]
    pc = jnp.concatenate([forest.pos, forest.radius[:, None]], -1)
    pc_child = pc[child]                                         # [NC,4]
    pos_child, r_child = pc_child[:, :3], pc_child[:, 3]

    node_tbl = jnp.concatenate([
        forest.pos, pos_par, pos_child, r_child[:, None],
        forest.n_children.astype(jnp.float32)[:, None],
        forest.is_root.astype(jnp.float32)[:, None]], -1)        # [NC,12]
    stbl = node_tbl[aidx]                                        # [Sq,12]
    npos = stbl[:, 0:3]
    v_prox = npos - stbl[:, 3:6]
    v_dist = stbl[:, 6:9] - npos
    nr_child = stbl[:, 9]
    n_nch = stbl[:, 10]
    n_isroot = stbl[:, 11] > 0.5

    att_vec = sink_pos - npos
    att_dir = _norm(att_vec)
    ang_prox = _angle_deg(v_prox, att_vec)
    ang_dist = _angle_deg(v_dist, att_vec)

    node_is_leaf = (n_nch == 0) & ~n_isroot
    node_is_inter = (n_nch == 1) & ~n_isroot

    # Murray angles per assigned node
    r1_inter = nr_child
    rp_inter = (r1_inter**kappa + r**kappa) ** (1.0 / kappa)

    def _acos_deg(x):
        return jnp.degrees(jnp.arccos(jnp.clip(x, -1.0, 1.0)))

    phi1_i = _acos_deg((rp_inter**4 + r1_inter**4 - r**4)
                       / (2 * rp_inter**2 * r1_inter**2))
    phi2_i = _acos_deg((rp_inter**4 + r**4 - r1_inter**4)
                       / (2 * rp_inter**2 * r**2))

    leaf_ok = ang_prox <= jnp.maximum(gamma / 2, 0.0)
    inter_ok = ((phi1_i + phi2_i - gamma / 2 <= ang_dist)
                & (ang_dist <= phi1_i + phi2_i + gamma / 2)
                & (ang_prox <= phi2_i + gamma / 2))
    valid_sink = has_assign & jnp.where(
        node_is_leaf, leaf_ok, jnp.where(node_is_inter, inter_ok, False))

    seg = jnp.where(valid_sink, aidx, nc)  # target node (nc = dropped)

    # six segment sums fused into ONE 18-feature reduction
    sq = sink_pos.shape[0]
    feats = jnp.concatenate([
        jnp.ones((sq, 1)), att_dir, ang_prox[:, None],
        (ang_prox**2)[:, None], sink_pos,
        (sink_pos[:, :, None] * sink_pos[:, None, :]).reshape(sq, 9),
    ], axis=-1)                                                   # [Sq,18]
    if _use_pallas():
        # one-hot MXU matmul: scatter costs ~45 ms/iter at this width on
        # this backend (serial per-index); the kernel builds one-hot tiles
        # in VMEM and contracts on the MXU (ops/pallas_segsum.py). The nc
        # sentinel rows match no node id, so pre-masking feats is redundant.
        sums = segsum_onehot_pallas(seg, feats, nc=nc)
    else:
        sums = jnp.zeros((nc + 1, 18), jnp.float32).at[seg].add(
            jnp.where(valid_sink[:, None], feats, 0.0))[:nc]
    cnt = sums[:, 0]
    sum_dir = sums[:, 1:4]
    sum_ang = sums[:, 4]
    sum_ang2 = sums[:, 5]
    sum_att = sums[:, 6:9]
    sum_outer = sums[:, 9:18].reshape(nc, 3, 3)

    has = cnt > 0
    n = jnp.maximum(cnt, 1.0)
    mean_ang = sum_ang / n
    std_ang = jnp.sqrt(jnp.maximum(sum_ang2 / n - mean_ang**2, 0.0))
    avg_attr = sum_dir  # unnormalized sum of unit vectors (reference)
    c_mean = sum_att / n[:, None]
    # covariance of (atts - c): reference divides by (n-1); direction-invariant
    M = sum_outer - n[:, None, None] * (c_mean[:, :, None] * c_mean[:, None, :])

    active = (forest.n_children < 2) & (jnp.arange(nc) < forest.n_nodes)
    is_leaf_n = (forest.n_children == 0) & ~forest.is_root & active
    is_inter_n = (forest.n_children == 1) & ~forest.is_root & active

    k1, k2, k3 = jax.random.split(key, 3)
    u_bif = jax.random.uniform(k1, (nc,))
    u_sprout = jax.random.uniform(k2, (nc,))

    vec_center = jnp.concatenate(
        [faz_center - forest.pos[:, :2],
         jnp.zeros((nc, 1))], axis=-1)
    dist_center = jnp.linalg.norm(vec_center[:, :2], axis=-1)
    ang_center_attr = _angle_deg(vec_center[:, :2], avg_attr[:, :2])

    faz_term = (dist_center / (2 * faz_radius + 1e-12)) ** 5
    bif_rand_ok = (faz_radius == 0) | ((faz_term > u_bif)
                                       & (ang_center_attr > 90.0))

    # ---- leaf bifurcation ----
    bifurcate = is_leaf_n & has & (std_ang > phi) & bif_rand_ok
    rp_leaf = (2.0 * r**kappa) ** (1.0 / kappa)
    phi_leaf = _acos_deg(rp_leaf**2 / (2 * r**2))
    d_parent_c = _norm(c_mean - forest.pos)
    d_l = _power_iteration_3x3(M)
    cosp, sinp = (jnp.cos(jnp.radians(phi_leaf)),
                  jnp.sin(jnp.radians(phi_leaf)))
    p_new_1 = forest.pos + _norm(cosp * d_parent_c + sinp * d_l) * d
    p_new_2 = forest.pos + _norm(cosp * d_parent_c - sinp * d_l) * d

    # ---- leaf elongation ----
    v_prox_n = forest.pos - pos_par
    g = omega * _norm(v_prox_n) + (1 - omega) * _norm(avg_attr)
    if rotation_radius > 0:
        gn = _norm(g)
        center_vec = _norm(vec_center)
        new_pos_tmp = forest.pos + d * gn
        dist_new = jnp.linalg.norm(
            faz_center - new_pos_tmp[:, :2], axis=-1)
        floor = 0.0 if first_mode else 0.01
        weight = jnp.sqrt(jnp.maximum(floor, rotation_radius - dist_new))
        ort = jnp.stack([-center_vec[:, 1], center_vec[:, 0],
                         jnp.zeros((nc,))], axis=-1)
        flip = _angle_deg(gn[:, :2], ort[:, :2]) > 90.0
        ort = jnp.where(flip[:, None], -ort, ort)
        out_vec = jnp.stack([-center_vec[:, 0], -center_vec[:, 1],
                             jnp.zeros((nc,))], axis=-1)
        g_rot = ((1 - weight)[:, None] * gn + 0.7 * weight[:, None] * ort
                 + 0.3 * weight[:, None] * out_vec)
        apply_rot = jnp.asarray(t > 15)
        g = jnp.where(apply_rot, g_rot, g)
    p_elong = forest.pos + d * _norm(g)
    elongate = is_leaf_n & has & ~bifurcate

    # ---- inter-node sprouting (Rodrigues) ----
    distal = _norm(pos_child - forest.pos)
    cross = jnp.cross(distal, avg_attr)
    cross_zero = jnp.all(cross == 0.0, axis=-1)
    sprout_rand_skip = ((faz_term <= u_sprout)
                        & (ang_center_attr <= 90.0)) & (faz_radius != 0)
    sprout = is_inter_n & has & ~cross_zero & ~sprout_rand_skip
    rot_axis = _norm(cross)
    # inter-node phi2 per node
    r1_n = r_child
    rp_n = (r1_n**kappa + r**kappa) ** (1.0 / kappa)
    phi2_n = _acos_deg((rp_n**4 + r**4 - r1_n**4) / (2 * rp_n**2 * r**2))
    v_rot = _rodrigues(distal, rot_axis, phi2_n)
    g_s = omega * _norm(v_rot) + (1 - omega) * _norm(avg_attr)
    p_sprout = forest.pos + d * _norm(g_s)

    # ---- emit new nodes (scatter-free append) ----
    # New nodes land in the contiguous window [n_nodes, n_nodes+total_new).
    # Instead of scattering up-to-2NC candidate entries (XLA scatter is
    # serial per index: the 2M-index emission scatter cost 83 ms/iteration
    # at 16k capacity), invert the prefix sum: for each window slot j the
    # source node is searchsorted(cumsum(n_emit), j), every per-slot value
    # becomes a gather, and one dynamic_update_slice writes the window.
    new_cap = min(new_cap, nc)
    n_emit_raw = (2 * bifurcate + 1 * elongate + 1 * sprout).astype(jnp.int32)
    cum_raw = jnp.cumsum(n_emit_raw)
    fits = ((forest.n_nodes + cum_raw) <= nc) & (cum_raw <= new_cap)
    # window overflow -> segment redo with a bigger window; once the window
    # equals node capacity a bigger window cannot help (drops then mean the
    # forest itself is full — the node-capacity staging redo handles that),
    # so don't signal: a sat that doubling can't clear would livelock the
    # redo loop
    sat = (cum_raw[-1] > new_cap) if new_cap < nc else jnp.asarray(False)
    n_emit = jnp.where(fits, n_emit_raw, 0)
    cum = jnp.cumsum(n_emit)
    offs = forest.n_nodes + cum - n_emit
    total_new = cum[-1]

    first_pos = jnp.where(bifurcate[:, None], p_new_1,
                          jnp.where(elongate[:, None], p_elong, p_sprout))
    emit1 = (n_emit >= 1)
    emit2 = (n_emit >= 2) & bifurcate

    j = jnp.arange(new_cap, dtype=jnp.int32)
    src = jnp.clip(
        jnp.searchsorted(cum, j, side="right", method="compare_all"),
        0, nc - 1).astype(jnp.int32)
    valid = j < total_new
    rank2 = (j - (cum[src] - n_emit[src])) == 1   # second bifurcation child
    win_pos = jnp.where(rank2[:, None], p_new_2[src], first_pos[src])

    def _append(arr, vals, fill):
        ext = jnp.concatenate(
            [arr, jnp.full((new_cap,) + arr.shape[1:], fill, arr.dtype)], 0)
        old = jax.lax.dynamic_slice_in_dim(ext, forest.n_nodes, new_cap, 0)
        upd = jnp.where(valid.reshape((-1,) + (1,) * (arr.ndim - 1)),
                        vals.astype(arr.dtype), old)
        return jax.lax.dynamic_update_slice_in_dim(
            ext, upd, forest.n_nodes, 0)[:nc]

    pos = _append(forest.pos, win_pos, 0.0)
    radius = _append(forest.radius, jnp.full((new_cap,), r, jnp.float32), 0.0)
    parent = _append(forest.parent, src, -1)
    # new nodes carry the current mode's kappa; their parent's kappa is
    # frozen at the parent's creation (reference arterial_tree.py:32,180)
    kap = _append(forest.kappa, jnp.full((new_cap,), kappa, jnp.float32),
                  4.0)
    pkap = _append(forest.pkappa, forest.kappa[src], 4.0)

    # child pointers / counts are per-source-node -> pure elementwise
    set_fc = emit1 & (forest.n_children == 0)
    first_child = jnp.where(set_fc, offs, forest.first_child)
    n_children = forest.n_children + n_emit
    is_root = forest.is_root
    n_nodes = forest.n_nodes + total_new

    new_forest = ForestState(pos, radius, parent, first_child,
                             n_children, is_root, n_nodes, kap, pkap)

    # ---- Murray radius sweeps (optimize_edge_radius_to_root) ----
    new_forest = murray_sweep(new_forest, murray_sweeps)

    return new_forest, sat


def murray_sweep(forest: ForestState, sweeps: int,
                 exact: bool | None = None) -> ForestState:
    """``sweeps`` parallel Murray-law radius relaxation sweeps
    (``arterial_tree.py:174-184``): each sweep recomputes every internal
    node's radius from its children, r_p = (sum r_c^kappa_p)^(1/kappa_p)
    with kappa_p the PARENT node's creation-mode kappa (per-node, exactly
    as the reference's ``self.kappa``), propagating changes one level
    root-ward per sweep.

    The per-parent child sum is a 1-feature segment sum: on TPU the in-loop
    sweeps route through the digit-decomposed one-hot MXU kernel
    (``ops/pallas_segsum.py``), which replaces the serial per-index scatter.
    ``exact=True`` (the final deep convergence sweep, and the CPU path)
    keeps the exact f32 scatter-add; measured gather alternatives lose
    (26 vs 9 ms/sweep at 16k capacity — gathers are serial per index too,
    and need 2 per sweep).

    The radii have a UNIQUE fixed point given the tree (leaf radii are
    pinned at r), so the exact deep final sweep after growth recovers the
    converged radii regardless of how much in-loop sweeping lagged (or of
    the kernel's ~1e-5 summation reordering); in-loop sweeps only matter
    through the growth decisions (child radius in the Murray angle checks,
    trunk radii in the oxygen-distance candidate rejection), which the
    statistical parity tests gate."""
    nc = forest.pos.shape[-2]
    # The kernel route is the TPU default: measured inside the full
    # scan-nested growth program it wins 1311.5 vs 1472.8 ms/sample on the
    # docker schedule at batch 32 (2026-08-18 A/B, docs/PERF_LOG.md).
    # Opt out with OCTA_TPU_MURRAY_KERNEL=0 (e.g. to re-run the A/B).
    gate = _os.environ.get("OCTA_TPU_MURRAY_KERNEL", "1") == "1"
    use_kernel = (_use_pallas() and gate) if exact is None else not exact

    def murray(i, f: ForestState):
        exists = jnp.arange(nc) < f.n_nodes
        # each child contributes radius^(parent's kappa); pkappa was frozen
        # at creation so no per-sweep gather is needed
        rk = jnp.where(exists, f.radius**f.pkappa, 0.0)
        par_t = jnp.where(exists & (f.parent >= 0), f.parent, nc)
        if use_kernel:
            child_sum = segsum_onehot_pallas(par_t, rk[:, None], nc=nc)[:, 0]
        else:
            child_sum = jnp.zeros((nc + 1,), jnp.float32).at[par_t].add(
                rk)[:nc]
        is_internal = (f.n_children >= 1) & ~f.is_root & exists
        new_r = jnp.where(is_internal,
                          child_sum ** (1.0 / f.kappa), f.radius)
        return f._replace(radius=new_r)

    return jax.lax.fori_loop(0, sweeps, murray, forest)


# ---------------------------------------------------------------------------
# Iteration driver
# ---------------------------------------------------------------------------

def _iteration(state: StackedState, mp: ModeParams, i, t, d_start, *,
               param_scale, r0, rotation_radius, faz_center, size_z,
               n_cand, murray_sweeps=8, nerve_center=None,
               nerve_radius=0.0, geometry=None, chunk=2048,
               new_cap=1024) -> StackedState:
    """One greenhouse iteration (``greenhouse.py:90-126``), with both
    forests grown in one stacked pass.

    ``i`` is the within-mode index: at i==0 the raw mode parameters apply
    (the reference quirk above); afterwards params = raw/(param_scale*sigma).

    Scheduling vs the reference: candidates accepted at step 1 participate
    in arterial growth and the satisfied-sink check of the same iteration
    (exact), but venous growth sees the CO2 set from *before* this
    iteration's conversions — new CO2 sources become growable one iteration
    later (1 of 100-150; statistically negligible, and the CO2-eligibility
    check against pre-growth venous nodes matches the reference exactly,
    ``greenhouse.py:99-123``)."""
    key, k_cand, k_art, k_ven = jax.random.split(state.key, 4)

    first = i == 0
    denom = jnp.where(first, 1.0, param_scale * state.sigma_t)
    eps_n = mp.eps_n / denom
    eps_s = mp.eps_s / denom
    eps_k = mp.eps_k / denom
    delta_art = mp.delta_art / denom
    delta_ven = mp.delta_ven / denom
    d = jnp.where(
        first, d_start,
        jnp.maximum(d_start / state.sigma_t, 0.04 / param_scale))

    F, S = state.forests, state.sinks
    nc = F.pos.shape[1]
    sc = S.pos.shape[1]
    exists = jnp.arange(nc)[None, :] < F.n_nodes[:, None]        # [2, NC]
    active = (F.n_children < 2) & exists

    # --- 1a. sample oxygen-sink candidates ---
    cand, valid = _sample_candidates(
        k_cand, n_cand, faz_center, state.faz_radius, size_z,
        nerve_center=nerve_center, nerve_radius=nerve_radius,
        geometry=geometry)
    if _banded():
        # y-sort the candidates so their query tiles are spatially
        # coherent in every banded scan below. The sort is DATA-dependent,
        # and _blocked_greedy_spacing is order-sensitive (y-sorting packs
        # spatially-near candidates into the same block, inflating
        # intra-block over-rejection — round-4 advisor finding), so the
        # greedy below runs in the ORIGINAL sample order via `order`/its
        # inverse and only the distance scans see the sorted layout.
        order = jnp.argsort(cand[:, 1])
        inv_order = jnp.argsort(order)
        cand = cand[order]
        valid = valid[order]

    # --- fused nearest-neighbor pass. Two single-mask calls replace the
    # five separate distance scans of the unstacked form, sized so every
    # computed (row, query-range) lane is consumed: call 1, rows = (0)
    # [oxy;cand]->art active (growth assignment), (1) [oxy;cand]->ven
    # existing (CO2-eligibility distance), (2) [co2;cand]->ven active
    # (venous assignment); call 2 = candidates->art existing (candidate
    # rejection), which only needs the 2k-candidate suffix and so runs as
    # its own small scan rather than as a second full-width mask. ---
    q01 = jnp.concatenate([S.pos[0], cand], axis=0)              # [Sq,3]
    q = jnp.stack([q01, q01, jnp.concatenate([S.pos[1], cand], 0)])
    pts = F.pos[jnp.asarray([0, 1, 1])]
    mask1 = jnp.stack([active[0], exists[1], active[1]])
    if _use_pallas() and _banded():
        # banded main scan: every consumer of these rows is gated on a
        # radius bound (row 0: dist<=delta_art in _grow_core; row 1:
        # dA[2]>eps_k in the CO2 conversion; row 2: dist<=delta_ven), so
        # skipping point blocks beyond the per-row band is exact. Query
        # aliveness mirrors the downstream gates: sink rows use the alive
        # masks; the candidate suffix is consumed (via `accept`) on rows
        # 0-1 and never on row 2.
        ones_c = jnp.ones(cand.shape[:1], bool)
        alive_q = jnp.stack([
            jnp.concatenate([S.alive[0], ones_c]),
            jnp.concatenate([S.alive[0], ones_c]),
            jnp.concatenate([S.alive[1], jnp.zeros_like(ones_c)])])
        band = jnp.stack([delta_art, eps_k, delta_ven]).astype(jnp.float32)
        dd, ii = masked_nearest_banded_pallas(
            q, pts, mask1[:, None, :], alive_q, band)
        # candidate rejection is gated on d <= max(eps_n, eps_k) (and the
        # nearest trunk's oxygen radius, which only matters when that
        # predicate already holds), so it bands exactly too
        d_cand, i_cand = masked_nearest_banded_pallas(
            cand[None], F.pos[:1], exists[:1][:, None, :],
            jnp.ones(cand.shape[:1], bool)[None],
            jnp.maximum(eps_n, eps_k)[None].astype(jnp.float32))
        dA = jnp.stack([dd[0, 0], dd[2, 0], dd[1, 0]])
        iA = jnp.stack([ii[0, 0], ii[2, 0], ii[1, 0]])
        d_cand_art, i_cand_art = d_cand[0, 0], i_cand[0, 0]
    elif _use_pallas():
        dd, ii = masked_nearest_pallas(q, pts, mask1[:, None, :])
        d_cand, i_cand = masked_nearest_pallas(
            cand[None], F.pos[:1], exists[:1][:, None, :])
        dA = jnp.stack([dd[0, 0], dd[2, 0], dd[1, 0]])
        iA = jnp.stack([ii[0, 0], ii[2, 0], ii[1, 0]])
        d_cand_art, i_cand_art = d_cand[0, 0], i_cand[0, 0]
    else:
        dd, ii = jax.vmap(
            lambda qq, pp, a: _chunked_nearest(
                qq, pp, a, chunk=max(256, chunk // 4)))(q, pts, mask1)
        dA = jnp.stack([dd[0], dd[2], dd[1]])
        iA = jnp.stack([ii[0], ii[2], ii[1]])
        d_cand_art, i_cand_art = _chunked_nearest(
            cand, F.pos[0], exists[0], chunk=max(256, chunk // 4))

    # --- 1b. candidate filtering (``greenhouse.py:319-341``) ---
    # reject near arterial nodes (within eps_n AND inside the oxygen radius)
    i_cand_art = jnp.clip(i_cand_art, 0, nc - 1)
    oxy_d = _oxygen_distance(F.radius[0][i_cand_art], param_scale)
    near_bad = (d_cand_art <= jnp.maximum(eps_n, eps_k)) & (d_cand_art <= oxy_d)
    valid &= ~near_bad
    # reject near existing oxygen sinks
    if _use_pallas() and _banded():
        # consumed only through `d_oxy > eps_s`, so eps_s-banded is exact;
        # the sink array's alive prefix is y-sorted between restages and
        # the candidates were y-sorted above
        d_oxy = masked_nearest_banded_pallas(
            cand[None], S.pos[0][None], S.alive[0][None, None],
            jnp.ones(cand.shape[:1], bool)[None],
            eps_s[None].astype(jnp.float32), want_idx=False)[0, 0]
    elif _use_pallas():
        d_oxy = masked_nearest_pallas(
            cand[None], S.pos[0][None], S.alive[0][None, None],
            want_idx=False)[0, 0]
    else:
        d_oxy = _chunked_min_dist_subset(cand, S.pos[0], S.alive[0],
                                         chunk=chunk)
    valid &= d_oxy > eps_s
    # mutual spacing (blocked greedy) — order-sensitive, so under the
    # banded layout it runs in the ORIGINAL candidate order (identical
    # accept decisions to the unbanded arm at the same seed) and the mask
    # is permuted back to the sorted layout; two n_cand-sized gathers.
    if _banded():
        accept = _blocked_greedy_spacing(
            cand[inv_order], valid[inv_order], eps_s)[order]
    else:
        accept = _blocked_greedy_spacing(cand, valid, eps_s)

    # --- 2+4. stacked growth: arterial on [oxy; accepted cand], venous on
    # [co2; -] ---
    view_alive = jnp.stack([
        jnp.concatenate([S.alive[0], accept]),
        jnp.concatenate([S.alive[1], jnp.zeros_like(accept)])])
    view_pos = jnp.stack([q[0], q[2]])                           # [2, Sq, 3]

    def grow_row(f, sp, sa, dist, idx, ga, de, kk):
        return _grow_core(
            f, sp, sa, dist, idx, gamma=ga, delta=de, d=d, r=r0,
            kappa=mp.kappa, phi=mp.phi, omega=mp.omega,
            faz_center=faz_center, faz_radius=state.faz_radius,
            rotation_radius=rotation_radius, first_mode=mp.first_mode,
            t=t, key=kk, murray_sweeps=murray_sweeps, new_cap=new_cap)

    newF, sat = jax.vmap(grow_row)(
        F, view_pos, view_alive, dA[:2], iA[:2],
        jnp.asarray([mp.gamma_art, mp.gamma_ven], jnp.float32),
        jnp.stack([delta_art, delta_ven]),
        jnp.stack([k_art, k_ven]))

    # --- 3+5. satisfied sinks (within eps_k of this iteration's new nodes).
    # New nodes are a dense window [n_nodes_old, n_nodes_new): slice it
    # (padded so a near-capacity slice can't clamp-shift) instead of
    # distance-scanning the whole node array under a window mask ---
    k_new = min(new_cap, nc)
    win_pos = jax.vmap(
        lambda p, s: jax.lax.dynamic_slice_in_dim(
            jnp.concatenate([p, jnp.zeros((k_new, 3), p.dtype)], 0),
            s, k_new, 0))(newF.pos, F.n_nodes)
    win_valid = (jnp.arange(k_new)[None, :]
                 < (newF.n_nodes - F.n_nodes)[:, None])
    if _use_pallas():
        d_new = masked_nearest_pallas(
            view_pos, win_pos, win_valid[:, None, :], want_idx=False)[:, 0]
    else:
        d_new = jax.vmap(
            lambda qq, pp, m: _chunked_min_dist_subset(
                qq, pp, m, chunk=min(chunk, k_new)))(
                    view_pos, win_pos, win_valid)
    satisfied = view_alive & (d_new <= eps_k)
    # oxygen sinks satisfied by new arterial nodes convert to CO2 when no
    # venous node (pre-growth, as in the reference) is within eps_k
    to_co2 = satisfied[0] & (dA[2] > eps_k)

    oxy_alive = S.alive[0] & ~satisfied[0, :sc]
    co2_alive = S.alive[1] & ~satisfied[1, :sc]
    base = SinkState(S.pos, jnp.stack([oxy_alive, co2_alive]))
    # one stacked append: row 0 stores surviving new candidates as oxygen
    # sinks, row 1 stores converted CO2 sources (from oxy slots or new cands)
    acc0 = jnp.concatenate([jnp.zeros((sc,), bool),
                            accept & ~satisfied[0, sc:]])
    props = jnp.stack([view_pos[0], view_pos[0]])
    # append window doubles with the emission cap from 2048 so the first
    # ecap doubling already enlarges it (a redo with an unchanged window
    # would re-saturate on the same iteration)
    newS, sat_win, sat_cap = jax.vmap(
        lambda b, p, a: _append_sinks(
            b, p, a, max_append=max(2048, 2 * new_cap)))(
                base, props, jnp.stack([acc0, to_co2]))

    # --- 6. simulation space expansion ---
    sigma = state.sigma_t + mp.delta_sigma
    d_cur = jnp.maximum(d_start / sigma, 0.04 / param_scale)

    sat_bits = ((jnp.any(sat) | jnp.any(sat_win)).astype(jnp.int32)
                + 2 * jnp.any(sat_cap).astype(jnp.int32))
    return StackedState(newF, newS, sigma, d_cur, state.d_start,
                        state.faz_radius, key,
                        state.sat | sat_bits)


def run_mode(state: GrowthState, mp: ModeParams, t0: int, *, param_scale,
             r0, rotation_radius, faz_center, size_z,
             murray_sweeps=8, collect_stats: bool = False,
             i0: int = 0, seg_len: int | None = None,
             nerve_center=None, nerve_radius=0.0, geometry=None,
             chunk=2048, new_cap=1024):
    """Run iterations ``i0 .. i0+seg_len`` of one mode under lax.scan.
    Sigma resets to 1 at mode entry (i0 == 0) and ``d`` continues
    (compounds) from the previous mode, as in ``init_params_from_config``
    (``greenhouse.py:34-51``). Segmenting (i0 > 0) lets the driver grow the
    node capacity between segments instead of paying the final capacity for
    every iteration.

    With ``collect_stats`` returns per-iteration counters (node / sink
    counts, sigma) — the data behind the reference's ``save_stats`` plots
    (``greenhouse.py:401-441``)."""
    n_cand = int(mp.N)
    seg_len = mp.I if seg_len is None else seg_len
    if i0 == 0:
        state = state._replace(sigma_t=jnp.float32(1.0),
                               d_start=state.d_cur)
    stacked = _stack_state(state)

    def body(st, i):
        st = _iteration(
            st, mp, i, t0 + i, st.d_start, param_scale=param_scale,
            r0=r0, rotation_radius=rotation_radius, faz_center=faz_center,
            size_z=size_z, n_cand=n_cand, murray_sweeps=murray_sweeps,
            nerve_center=nerve_center, nerve_radius=nerve_radius,
            geometry=geometry, chunk=chunk, new_cap=new_cap)
        stats = None
        if collect_stats:
            n_alive = jnp.sum(st.sinks.alive, axis=-1)
            stats = jnp.stack([
                st.forests.n_nodes[0].astype(jnp.float32),
                st.forests.n_nodes[1].astype(jnp.float32),
                n_alive[0].astype(jnp.float32),
                n_alive[1].astype(jnp.float32),
                st.sigma_t,
            ])
        return st, stats

    stacked, stats = jax.lax.scan(body, stacked, i0 + jnp.arange(seg_len))
    state = _unstack_state(stacked)
    return (state, stats) if collect_stats else state


# ---------------------------------------------------------------------------
# Forest initialization + Greenhouse driver
# ---------------------------------------------------------------------------

def init_forest_stumps(rng: np.random.Generator, n_trees: int,
                       source_walls: list[str], d0: float, r0: float,
                       sizes: tuple[float, float, float],
                       node_capacity: int) -> ForestState:
    """'stumps' initialization (``forest.py:68-181``): tree roots on the
    lateral faces of the cuboid, first segment pointing inward. Host-side
    numpy (tiny)."""
    sx, sy, sz = sizes
    pos = np.zeros((node_capacity, 3), np.float32)
    radius = np.zeros((node_capacity,), np.float32)
    parent = np.full((node_capacity,), -1, np.int32)
    first_child = np.full((node_capacity,), -1, np.int32)
    n_children = np.zeros((node_capacity,), np.int32)
    is_root = np.zeros((node_capacity,), bool)
    # stump/root nodes carry the reference Node's default kappa=4
    # (``arterial_tree.py:9``; forest.py adds stumps without passing kappa)
    kap = np.full((node_capacity,), 4.0, np.float32)
    i = 0
    for _ in range(n_trees):
        wall = source_walls[int(rng.integers(0, len(source_walls)))]
        ax = {"x": 0, "y": 1, "z": 2}[wall[0]]
        hi = wall[1] == "1"
        other = [a for a in range(3) if a != ax]
        sizes_arr = np.array([sx, sy, sz])
        p = np.zeros(3)
        p[ax] = sizes_arr[ax] - 1e-6 if hi else 0.0
        p[other[0]] = rng.uniform(0, sizes_arr[other[0]])
        p[other[1]] = rng.uniform(0, sizes_arr[other[1]])
        direction = np.zeros(3)
        direction[ax] = rng.uniform(-1, -0.1) if hi else rng.uniform(0.1, 1)
        for o in other:
            lo_ok = p[o] - d0 > 0
            hi_ok = p[o] + d0 < sizes_arr[o]
            direction[o] = rng.uniform(-1 if lo_ok else 0, 1 if hi_ok else 0)
        direction = direction / np.linalg.norm(direction) * d0
        # root
        pos[i] = p
        radius[i] = r0
        is_root[i] = True
        n_children[i] = 1
        first_child[i] = i + 1
        # stump node
        pos[i + 1] = p + direction
        radius[i + 1] = r0
        parent[i + 1] = i
        i += 2
    return ForestState(
        jnp.asarray(pos), jnp.asarray(radius), jnp.asarray(parent),
        jnp.asarray(first_child),
        jnp.asarray(n_children), jnp.asarray(is_root), jnp.int32(i),
        jnp.asarray(kap), jnp.asarray(kap))


def init_forest_nerve(rng: np.random.Generator, n_trees: int, d0: float,
                      r0: float, nerve_center: np.ndarray,
                      nerve_radius: float, size_z: float,
                      node_capacity: int) -> ForestState:
    """'nerve' initialization (``forest.py:38-66``): every tree root packed
    inside the optic-nerve disc (uniform over the disc via sqrt-radius
    sampling), z uniform over the slab, first segment a random in-plane
    (z=0) unit direction scaled by d0. The reference swaps the center
    components (x uses nerve_center[1], y uses nerve_center[0] —
    ``forest.py:58-59``); replicated for parity. Host-side numpy (tiny)."""
    pos = np.zeros((node_capacity, 3), np.float32)
    radius = np.zeros((node_capacity,), np.float32)
    parent = np.full((node_capacity,), -1, np.int32)
    first_child = np.full((node_capacity,), -1, np.int32)
    n_children = np.zeros((node_capacity,), np.int32)
    is_root = np.zeros((node_capacity,), bool)
    kap = np.full((node_capacity,), 4.0, np.float32)
    i = 0
    for _ in range(n_trees):
        alpha = 2 * np.pi * rng.random()
        rr = nerve_radius * np.sqrt(rng.random())
        p = np.array([rr * np.cos(alpha) + nerve_center[1],
                      rr * np.sin(alpha) + nerve_center[0],
                      rng.random() * size_z])
        direction = np.array([rng.random() - 0.5, rng.random() - 0.5, 0.0])
        direction = direction / np.linalg.norm(direction) * d0
        pos[i] = p
        radius[i] = r0
        is_root[i] = True
        n_children[i] = 1
        first_child[i] = i + 1
        pos[i + 1] = p + direction
        radius[i + 1] = r0
        parent[i + 1] = i
        i += 2
    return ForestState(
        jnp.asarray(pos), jnp.asarray(radius), jnp.asarray(parent),
        jnp.asarray(first_child),
        jnp.asarray(n_children), jnp.asarray(is_root), jnp.int32(i),
        jnp.asarray(kap), jnp.asarray(kap))


class Greenhouse:
    """Config-driven growth driver (reference ``Greenhouse``,
    ``greenhouse.py:15-137``), batched: ``develop_forest(batch)`` grows
    ``batch`` independent samples in one vmapped, jit-compiled program."""

    def __init__(self, config: dict, node_capacity: int = 16384,
                 sink_capacity: int = 32768, seed: int = 0,
                 chunk: int = 1024):
        self.config = config
        self.param_scale = config["param_scale"]
        self.d = config["d"] / self.param_scale
        self.r = config["r"] / self.param_scale
        self.faz_bound = (config["FAZ_radius_bound"][0] / self.param_scale,
                          config["FAZ_radius_bound"][1] / self.param_scale)
        self.rotation_radius = config["rotation_radius"] / self.param_scale
        self.faz_center = np.asarray(config["FAZ_center"], np.float32)
        ss = config["SimulationSpace"]
        self.geometry = None
        self.nerve_center = None
        self.nerve_radius = 0.0
        if ss.get("oxygen_sample_geometry_path"):
            geo = np.load(ss["oxygen_sample_geometry_path"])
            gs = max(geo.shape)
            self.sizes = tuple(np.array(geo.shape) / gs)
            self.geometry = jnp.asarray(
                np.squeeze(np.asarray(geo, bool), axis=-1)
                if geo.ndim == 3 else np.asarray(geo, bool))
        else:
            self.sizes = (ss["no_voxel_x"], ss["no_voxel_y"], ss["no_voxel_z"])
            # optic-nerve disc carving from the sampling geometry
            # (``simulation_space.py:45-49``): active when the disc
            # intersects the unit simulation space
            if "nerve_center" in config and "nerve_radius" in config:
                nc = np.asarray(config["nerve_center"],
                                np.float32) / self.param_scale
                nr = float(config["nerve_radius"]) / self.param_scale
                if np.all(nc - nr <= 1.0):
                    self.nerve_center = jnp.asarray(nc)
                    self.nerve_radius = nr
        self.node_capacity = node_capacity
        self.sink_capacity = sink_capacity
        self.chunk = chunk  # distance-scan chunk: transient HBM ~ B*SC*chunk
        self.seed = seed
        self.modes = [
            ModeParams(
                I=m["I"], N=m["N"],
                eps_n=m["eps_n"], eps_s=m["eps_s"], eps_k=m["eps_k"],
                delta_art=m["delta_art"], delta_ven=m["delta_ven"],
                gamma_art=m["gamma_art"], gamma_ven=m["gamma_ven"],
                phi=m["phi"], omega=m["omega"], kappa=m["kappa"],
                delta_sigma=m["delta_sigma"], first_mode=(i == 0))
            for i, m in enumerate(config["modes"])
        ]

    def init_state(self, forest_config: dict, rng_seed: int,
                   node_capacity: int | None = None,
                   sink_capacity: int | None = None) -> GrowthState:
        rng = np.random.default_rng(rng_seed)
        ftype = forest_config.get("type", "stumps")
        cap = node_capacity or self.node_capacity
        if ftype == "stumps":
            walls = [k for k, v in forest_config["source_walls"].items() if v]
            art = init_forest_stumps(rng, forest_config["N_trees"], walls,
                                     self.d, self.r, self.sizes, cap)
            ven = init_forest_stumps(rng, forest_config["N_trees"], walls,
                                     self.d, self.r, self.sizes, cap)
        elif ftype == "nerve":
            # The reference passes greenhouse.nerve_center/_radius (raw
            # config values / param_scale, independent of the geometry
            # carve gate) into Forest — generate_vessel_graph.py:33-34,
            # greenhouse.py:28-29.
            if ("nerve_center" not in self.config
                    or "nerve_radius" not in self.config):
                raise ValueError(
                    "forest type 'nerve' needs Greenhouse.nerve_center and "
                    "Greenhouse.nerve_radius in the config")
            nc = (np.asarray(self.config["nerve_center"], np.float32)
                  / self.param_scale)
            nr = float(self.config["nerve_radius"]) / self.param_scale
            art = init_forest_nerve(rng, forest_config["N_trees"], self.d,
                                    self.r, nc, nr, self.sizes[2], cap)
            ven = init_forest_nerve(rng, forest_config["N_trees"], self.d,
                                    self.r, nc, nr, self.sizes[2], cap)
        else:
            raise NotImplementedError(
                f"forest initialization type {ftype!r} is not implemented; "
                "use 'stumps' or 'nerve' (reference forest.py:31-36)")
        sc = sink_capacity or self.sink_capacity
        empty = SinkState(jnp.zeros((sc, 3), jnp.float32),
                          jnp.zeros((sc,), bool))
        faz_r = rng.normal(self.faz_bound[0], self.faz_bound[1])
        return GrowthState(
            art, ven, empty, empty, jnp.float32(1.0), jnp.float32(self.d),
            jnp.float32(self.d), jnp.float32(max(faz_r, 0.0)),
            jax.random.PRNGKey(rng_seed), jnp.int32(0))

    #: iterations per capacity-staging segment
    SEG_LEN = 50

    def develop_forest(self, forest_config: dict, batch: int = 1,
                       murray_sweeps: int = 4, collect_stats: bool = False,
                       final_murray_sweeps: int = 256, mesh=None):
        """Grow ``batch`` samples with **capacity staging**: the growth loop's
        dominant cost is distance computation against the node array, which
        scales with the static capacity, not the live node count. The run is
        split into SEG_LEN-iteration segments; before each segment the node
        arrays are padded to a capacity forecast from the observed growth
        rate (one tiny host sync per segment), and a saturated segment is
        transparently re-run at doubled capacity, so results are identical
        to a fixed-capacity run that never saturates.

        ``murray_sweeps`` Murray radius sweeps run per growth iteration
        (propagating radius changes that many tree levels root-ward per
        iteration); ``final_murray_sweeps`` deep sweeps run ONCE at the end,
        converging the radii to their exact fixed point for the final tree
        — so the output radii are exact regardless of in-loop sweep lag
        (~9 ms/sweep at 16k capacity makes per-iteration deep sweeps the
        single most expensive part of the loop).

        ``mesh``: an optional ``jax.sharding.Mesh`` with a ``data`` axis.
        The simulations are independent and the whole segment program is
        ``jit(vmap(...))`` over the leading batch axis, so sharding the
        batch over ``data`` partitions every array and XLA compiles an
        SPMD program with no cross-device collectives (the TPU answer to
        the reference's per-CPU-core process pool,
        ``generate_vessel_graph.py:91-134``; SURVEY §2.9). The batch is
        padded internally to a multiple of the mesh size with extra
        independent seeds — per-iteration cost is largely
        batch-independent, so padding is near-free; callers read only the
        first ``batch`` samples."""
        n_shard = int(mesh.shape["data"]) if mesh is not None else 1
        grown = -(-batch // n_shard) * n_shard  # pad to a mesh multiple
        cap0 = _pow2ceil(max(
            1024, 4 * forest_config.get("N_trees", 8) + 64 * self.SEG_LEN))
        states = [self.init_state(forest_config, self.seed + i,
                                  node_capacity=min(cap0, self.node_capacity),
                                  sink_capacity=min(2048, self.sink_capacity))
                  for i in range(grown)]
        state = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            self._batch_sharding = NamedSharding(mesh, PartitionSpec("data"))
            state = jax.device_put(state, self._batch_sharding)
        else:
            self._batch_sharding = None

        segments = []
        t0 = 0
        for mi, mp in enumerate(self.modes):
            for i0 in range(0, mp.I, self.SEG_LEN):
                segments.append((mi, t0, i0, min(self.SEG_LEN, mp.I - i0)))
            t0 += mp.I
        all_stats = []
        slope = 64.0    # nodes/iteration forecast, refined per segment
        s_slope = 48.0  # alive-sinks/iteration forecast, refined per segment
        ecap = 1024     # per-iteration emission-window cap (staged like NC)
        n_now = float(np.asarray(
            jnp.maximum(state.art.n_nodes, state.ven.n_nodes)).max())
        s_now = float(np.asarray(jnp.sum(state.oxy.alive, -1)
                                 + jnp.sum(state.co2.alive, -1)).max())
        for mi, t0, i0, seg_len in segments:
            redos = 0
            while True:
                # 2048-granular capacities (not pow2: the distance scans,
                # Murray sweeps and segment sums all scale with capacity, and
                # pow2 rounding overshoots the live node count by up to 2x in
                # the expensive late segments); kernels pad to 2048 anyway
                cap = int(n_now + slope * seg_len * 1.8) + 64
                cap = _pow2ceil(cap) if cap <= 2048 else -(-cap // 2048) * 2048
                cap = min(max(cap, 1024), self.node_capacity)
                # sink capacity staged the same way (the reference's sink
                # list is unbounded, ``greenhouse.py:319-341``): the nearest
                # scans, segment sums and gathers all scale with the query
                # row count sc + n_cand, and a fixed full-size array pays the
                # late-DVC cost from iteration 0
                scap = int(s_now + s_slope * seg_len * 1.8) + 256
                scap = (_pow2ceil(scap) if scap <= 2048
                        else -(-scap // 2048) * 2048)
                scap = min(max(scap, 1024), self.sink_capacity)
                seg_state = _resize_sinks(_resize_forests(state, cap), scap)
                if _banded():
                    # y-sort node slots / compact+y-sort sink slots so the
                    # banded scans' per-block y-ranges are narrow for the
                    # whole segment (in-segment appends land at the tail
                    # and degrade only their own blocks to full scans)
                    seg_state = _restage_spatial(seg_state)
                if self._batch_sharding is not None:
                    # the eager resize pads can drop the batch sharding;
                    # re-pin so the segment compiles SPMD over `data`
                    seg_state = jax.device_put(seg_state,
                                               self._batch_sharding)
                # clear saturation bits at segment entry: ``sat`` is OR-
                # accumulated inside the scan, and a sticky bit from an
                # earlier (already redone) segment would trigger spurious
                # redos in every subsequent segment
                seg_state = seg_state._replace(
                    sat=jnp.zeros_like(seg_state.sat))
                fn = self._jitted_segment(
                    mi, t0, i0, seg_len, cap, murray_sweeps, collect_stats,
                    ecap, scap)
                out = jax.block_until_ready(fn(seg_state))
                new_state, stats = out if collect_stats else (out, None)
                sat = int(np.bitwise_or.reduce(np.asarray(new_state.sat)))
                redos += 1
                if redos > 16:
                    raise RuntimeError(
                        "develop_forest: capacity-staging redo did not "
                        f"converge (sat={sat}, ecap={ecap}, scap={scap}, "
                        f"cap={cap}) — raise node_capacity/sink_capacity")
                if (sat & 1) and ecap < self.node_capacity:
                    # emission/append window overflowed: redo, bigger
                    ecap = min(ecap * 2, self.node_capacity)
                    continue
                if (sat & 2) and scap < self.sink_capacity:
                    # sink array saturated: redo with a larger forecast
                    s_slope = max(s_slope * 2.0, 2.0 * (scap - s_now)
                                  / max(seg_len, 1))
                    continue
                n_after = float(np.asarray(jnp.maximum(
                    new_state.art.n_nodes, new_state.ven.n_nodes)).max())
                if n_after >= cap - 2 and cap < self.node_capacity:
                    slope *= 2.0  # saturated: redo the segment, bigger
                    continue
                # accepting with saturation bits set means ecap/scap are
                # already AT their ceilings (smaller values `continue`d
                # above): the segment truncated work the reference's
                # unbounded lists would have kept
                # (``greenhouse.py:319-341``). Never silent — warn (raises
                # under --debug's warnings-as-errors).
                node_full = n_after >= cap - 2 and cap >= self.node_capacity
                if sat or node_full:
                    trunc = []
                    if sat & 1:
                        trunc.append(f"emission window (ecap={ecap})")
                    if sat & 2:
                        trunc.append(f"sink array (scap={scap})")
                    if node_full:
                        trunc.append(f"node array (n={n_after:.0f})")
                    _warnings.warn(
                        "develop_forest: capacity ceiling reached — "
                        f"{', '.join(trunc)} truncated at node_capacity="
                        f"{self.node_capacity}, sink_capacity="
                        f"{self.sink_capacity}; results now diverge from an"
                        " unbounded run. Raise Greenhouse(node_capacity=..."
                        ", sink_capacity=...).",
                        RuntimeWarning, stacklevel=2)
                break
            slope = max(24.0, (n_after - n_now) / seg_len)
            n_now = n_after
            s_after = float(np.asarray(
                jnp.sum(new_state.oxy.alive, -1)
                + jnp.sum(new_state.co2.alive, -1)).max())
            s_slope = max(16.0, (s_after - s_now) / seg_len)
            s_now = s_after
            state = new_state
            if _os.environ.get("OCTA_TPU_STAGE_DEBUG"):
                print(f"[stage] mode {mi} i0 {i0}: cap={cap} scap={scap} "
                      f"ecap={ecap} nodes={n_after:.0f} alive={s_after:.0f}")
            if collect_stats:
                all_stats.append(stats)
        if final_murray_sweeps:
            state = self._final_murray(state, final_murray_sweeps)
        if grown != batch:
            # Mesh padding is purely internal: slice back to the requested
            # batch so callers iterating the leading axis never see the
            # padded samples (whose seeds self.seed+i, i>=batch would
            # collide with the next chunk's seeds downstream).
            state = jax.tree.map(lambda x: x[:batch], state)
        if collect_stats:
            stats_out = jnp.concatenate(all_stats, axis=1)
            return state, stats_out[:batch]
        return state

    def _final_murray(self, state: GrowthState, sweeps: int) -> GrowthState:
        """Converge both forests' radii to the exact Murray fixed point of
        the final trees (per-node creation kappa, exactly the reference's
        ``optimize_edge_radius_to_root`` semantics). One deep vmapped sweep
        per develop_forest — amortized over the batch it is ~2 orders of
        magnitude cheaper than keeping per-iteration sweeps deep."""
        cap = state.art.pos.shape[-2]
        key = ("final_murray", cap, sweeps)
        if not hasattr(self, "_jit_cache"):
            self._jit_cache = {}
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(jax.vmap(
                lambda f: murray_sweep(f, sweeps, exact=True)))
        fn = self._jit_cache[key]
        return state._replace(art=fn(state.art), ven=fn(state.ven))

    def _jitted_segment(self, mode_idx: int, t0: int, i0: int, seg_len: int,
                        cap: int, murray_sweeps: int, collect_stats: bool,
                        new_cap: int = 1024, sink_cap: int | None = None):
        """Cache jitted segment programs. A fresh ``jax.jit`` wrapper per
        call would re-trace AND re-compile every ``develop_forest`` — pure
        waste, and repeated remote compiles are the main source of tunnel
        flakiness on the axon TPU backend."""
        if not hasattr(self, "_jit_cache"):
            self._jit_cache = {}
        key = (mode_idx, t0, i0, seg_len, cap, murray_sweeps, collect_stats,
               new_cap, sink_cap)
        if key not in self._jit_cache:
            mp = self.modes[mode_idx]

            def run_seg(state):
                return run_mode(
                    state, mp, t0, param_scale=self.param_scale,
                    r0=self.r, rotation_radius=self.rotation_radius,
                    faz_center=jnp.asarray(self.faz_center),
                    size_z=self.sizes[2], murray_sweeps=murray_sweeps,
                    collect_stats=collect_stats, i0=i0, seg_len=seg_len,
                    nerve_center=self.nerve_center,
                    nerve_radius=self.nerve_radius,
                    geometry=self.geometry, chunk=self.chunk,
                    new_cap=new_cap)

            self._jit_cache[key] = jax.jit(jax.vmap(run_seg))
        return self._jit_cache[key]

    def save_stats(self, state: GrowthState, stats, out_dir: str,
                   sim_index: int = 0):
        """Growth statistics plots + yaml (reference ``save_stats``,
        ``greenhouse.py:401-441``): per-iteration node/sink counts and
        simulation-space scale, plus the final radii histogram."""
        import os

        import yaml as _yaml

        s = np.asarray(stats[sim_index])  # [iters, 5]
        edges = forest_to_edges(state.art, sim_index)
        radii = np.concatenate([
            edges["radius"],
            forest_to_edges(state.ven, sim_index)["radius"]])
        os.makedirs(out_dir, exist_ok=True)
        summary = {
            "iterations": int(s.shape[0]),
            "final_art_nodes": int(s[-1, 0]),
            "final_ven_nodes": int(s[-1, 1]),
            "final_sigma": float(s[-1, 4]),
            "radius_mean": float(radii.mean()) if radii.size else 0.0,
            "radius_max": float(radii.max()) if radii.size else 0.0,
        }
        with open(os.path.join(out_dir, "stats.yml"), "w") as f:
            _yaml.safe_dump(summary, f)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        fig, axes = plt.subplots(1, 3, figsize=(13, 3.5))
        axes[0].plot(s[:, 0], label="arterial nodes")
        axes[0].plot(s[:, 1], label="venous nodes")
        axes[0].set_xlabel("iteration")
        axes[0].legend()
        axes[1].plot(s[:, 2], label="O2 sinks")
        axes[1].plot(s[:, 3], label="CO2 sources")
        axes[1].plot(s[:, 4], label="sigma")
        axes[1].set_xlabel("iteration")
        axes[1].legend()
        axes[2].hist(radii * self.param_scale, bins=50)
        axes[2].set_xlabel("vessel radius")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, "stats.png"))
        plt.close(fig)


def _pow2ceil(n: int) -> int:
    return 1 << (max(int(n), 1) - 1).bit_length()


def _ysort_forest(f: ForestState) -> ForestState:
    """Permute one (unbatched) forest's node slots into y order (existing
    nodes ascending by pos.y, empty slots at the tail), remapping the
    parent/first_child pointers through the permutation. The tree is
    pointer-addressed (no child-contiguity assumption anywhere), so this
    is a pure relabeling: distances, Murray sweeps, edge extraction and
    growth semantics are unchanged — only nearest-scan argmin tie-breaks
    between exactly equidistant nodes can differ."""
    nc = f.pos.shape[-2]
    exists = jnp.arange(nc) < f.n_nodes
    key = jnp.where(exists, f.pos[:, 1], jnp.inf)
    perm = jnp.argsort(key, stable=True)
    inv = jnp.zeros((nc,), jnp.int32).at[perm].set(
        jnp.arange(nc, dtype=jnp.int32), unique_indices=True)

    def remap(p):
        return jnp.where(p >= 0, inv[jnp.clip(p, 0, nc - 1)], -1)

    return ForestState(
        pos=f.pos[perm], radius=f.radius[perm],
        parent=remap(f.parent[perm]),
        first_child=remap(f.first_child[perm]),
        n_children=f.n_children[perm], is_root=f.is_root[perm],
        n_nodes=f.n_nodes, kappa=f.kappa[perm], pkappa=f.pkappa[perm])


def _ysort_sinks(s: SinkState) -> SinkState:
    """Compact one (unbatched) sink array: alive sinks ascending by pos.y,
    dead (= free) slots at the tail. With ``_append_sinks``'s tail-most
    fill, the alive prefix stays y-coherent for the whole next segment."""
    key = jnp.where(s.alive, s.pos[:, 1], jnp.inf)
    perm = jnp.argsort(key, stable=True)
    return SinkState(pos=s.pos[perm], alive=s.alive[perm])


@jax.jit
def _restage_spatial(state: GrowthState) -> GrowthState:
    """Spatial restage at segment boundaries (banded-scan support): y-sort
    node slots and compact+y-sort sink slots, batched. See ``_banded``."""
    vf = jax.vmap(_ysort_forest)
    vs = jax.vmap(_ysort_sinks)
    return state._replace(art=vf(state.art), ven=vf(state.ven),
                          oxy=vs(state.oxy), co2=vs(state.co2))


def _resize_forests(state: GrowthState, cap: int) -> GrowthState:
    """Pad both (batched) forests' node arrays up to capacity ``cap``
    (never shrinks — shrinking could drop live nodes)."""
    cur = state.art.pos.shape[-2]
    if cap <= cur:
        return state
    extra = cap - cur

    def grow(f: ForestState) -> ForestState:
        pad2 = [(0, 0)] * (f.pos.ndim - 2) + [(0, extra), (0, 0)]
        pad1 = [(0, 0)] * (f.radius.ndim - 1) + [(0, extra)]
        return ForestState(
            pos=jnp.pad(f.pos, pad2),
            radius=jnp.pad(f.radius, pad1),
            parent=jnp.pad(f.parent, pad1, constant_values=-1),
            first_child=jnp.pad(f.first_child, pad1, constant_values=-1),
            n_children=jnp.pad(f.n_children, pad1),
            is_root=jnp.pad(f.is_root, pad1),
            n_nodes=f.n_nodes,
            kappa=jnp.pad(f.kappa, pad1, constant_values=4.0),
            pkappa=jnp.pad(f.pkappa, pad1, constant_values=4.0),
        )

    return state._replace(art=grow(state.art), ven=grow(state.ven))


def _resize_sinks(state: GrowthState, cap: int) -> GrowthState:
    """Pad both (batched) sink arrays up to capacity ``cap`` (never shrinks
    — shrinking could drop alive sinks; padded slots are dead = free)."""
    cur = state.oxy.pos.shape[-2]
    if cap <= cur:
        return state
    extra = cap - cur

    def grow(s: SinkState) -> SinkState:
        pad2 = [(0, 0)] * (s.pos.ndim - 2) + [(0, extra), (0, 0)]
        pad1 = [(0, 0)] * (s.alive.ndim - 1) + [(0, extra)]
        return SinkState(pos=jnp.pad(s.pos, pad2),
                         alive=jnp.pad(s.alive, pad1))

    return state._replace(oxy=grow(state.oxy), co2=grow(state.co2))


def forest_edges_device(f: ForestState):
    """Device-side edge arrays from a (possibly batched) ForestState:
    ``(node_xy, parent_xy, radius, valid)``, one edge slot per node (roots
    and padding invalid). Feeds the splat rasterizers directly — the
    generate→rasterize pipeline never round-trips edge lists through the
    host (the reference materializes CSVs between `generate_vessel_graph.py`
    and `tree2img.py`; on TPU that host hop costs more than rasterizing)."""
    nc = f.pos.shape[-2]
    exists = jnp.arange(nc) < (
        f.n_nodes[..., None] if f.n_nodes.ndim else f.n_nodes)
    par = jnp.clip(f.parent, 0, nc - 1)
    ppos = jnp.take_along_axis(f.pos, par[..., None], axis=-2)
    valid = exists & (f.parent >= 0)
    return f.pos[..., :2], ppos[..., :2], f.radius, valid


def forest_to_edges(forest_state, sim_index: int | None = None) -> dict:
    """Extract the edge list {'node1','node2','radius'} arrays from a (possibly
    batched) ForestState — parents-first order, roots excluded (matches the
    reference CSV writer, ``forest.py:196-207``)."""
    f = forest_state
    if sim_index is not None:
        f = jax.tree.map(lambda x: x[sim_index], f)
    n = int(f.n_nodes)
    pos = np.asarray(f.pos)[:n]
    parent = np.asarray(f.parent)[:n]
    radius = np.asarray(f.radius)[:n]
    mask = parent >= 0
    return {
        "node1": pos[mask],
        "node2": pos[np.clip(parent[mask], 0, n - 1)],
        "radius": radius[mask],
    }


def save_edges_csv(edges_list: list[dict], path: str):
    """Write merged forests to the reference CSV format."""
    import csv as _csv
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w+", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["node1", "node2", "radius"])
        for edges in edges_list:
            for i in range(len(edges["radius"])):
                n1 = " ".join(f"{v:.8f}" for v in edges["node1"][i])
                n2 = " ".join(f"{v:.8f}" for v in edges["node2"][i])
                w.writerow([f"[{n1}]", f"[{n2}]", edges["radius"][i]])
