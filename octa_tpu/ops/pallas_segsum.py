"""Segment-sum as a digit-decomposed one-hot MXU matmul (Pallas TPU kernel).

Replaces the F-feature scatter-add segment sum in the growth loop
(``octa_tpu/sim/greenhouse.py`` ``_grow_core``, the TPU rewrite of the
per-node attraction statistics in reference
``vessel_graph_generation/greenhouse.py:343-366``). Scatter on this backend
costs tens-to-hundreds of ns PER INDEX (serial), so summing F features from
Sq sinks into NC node slots by index costs ~45-90 ms per growth iteration at
batch 32.

The dense rewrite is ``out = one_hot(seg).T @ feats``, but a flat one-hot
costs NC x Sq comparisons on the VPU — measured 37-45 ms at R=64, Sq=10240,
NC=12288, i.e. comparison-bound, with the MXU orientation (N=18 pads to 128)
a secondary effect. The shipped kernel instead decomposes the node id into
two base-128 digits, ``seg = hi*128 + lo``, so

    out[f, hi*128+lo] = sum_s feats[f,s] * Lo[s,lo] * H[s,hi]

needs only (128 + NC/128) x Sq one-hot comparisons (~50x fewer); the
Khatri-Rao factor ``A[(f,lo), s] = featsT[f,s] * Lo[s,lo]`` is built in VMEM
(never HBM) and contracted against ``H`` on the MXU. Measured 30.3 ms at the
shapes above (vs 87-92 ms scatter standalone); accuracy 3.6e-5 via an exact
hi/lo bf16 split of the features (one-hot entries are exact in bf16; the
MXU's default f32 path rounds operands to bf16, which costs 2e-2).

The kernel carries no batch dimension, so ``jax.vmap`` (including the growth
loop's nested vmap over batch and the stacked art/ven rows) batches it by
prepending grid dimensions without disturbing the body.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_L = 128  # low-digit base: one lane register row of one-hot per sink


def _segsum_kernel(seg_ref, fT_ref, out_ref, *, n_sb, sb, nh):
    f = fT_ref.shape[0]
    dn = (((1,), (0,)), ((), ()))
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, _L), 1)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (1, nh), 1)

    def body(k, acc):
        sg = seg_ref[0, pl.ds(k * sb, sb)]               # [SB] i32
        ft = fT_ref[:, pl.ds(k * sb, sb)]                # [F, SB] f32
        hi = sg // _L
        lo = sg % _L
        onehot_lo = (lo[:, None] == iota_l).astype(jnp.bfloat16)  # [SB, L]
        onehot_hi = (hi[:, None] == iota_h).astype(jnp.bfloat16)  # [SB, NH]
        fh = ft.astype(jnp.bfloat16)
        fl = (ft - fh.astype(jnp.float32)).astype(jnp.bfloat16)
        a_h = (fh[:, None, :] * onehot_lo.T[None, :, :]).reshape(f * _L, sb)
        a_l = (fl[:, None, :] * onehot_lo.T[None, :, :]).reshape(f * _L, sb)
        return (acc
                + jax.lax.dot_general(a_h, onehot_hi, dn,
                                      preferred_element_type=jnp.float32)
                + jax.lax.dot_general(a_l, onehot_hi, dn,
                                      preferred_element_type=jnp.float32))

    acc = jax.lax.fori_loop(
        0, n_sb, body, jnp.zeros((f * _L, nh), jnp.float32))
    out_ref[...] = acc.reshape(f, _L, nh).transpose(0, 2, 1).reshape(
        f, nh * _L)


@functools.partial(jax.jit, static_argnames=("nc", "sb", "interpret"))
def segsum_onehot_pallas(seg, feats, *, nc: int, sb: int = 1024,
                         interpret: bool = False):
    """Per-node feature sums: ``out[n] = sum(feats[s] for seg[s] == n)``.

    seg:   [Sq] i32 in ``[0, nc]`` — target node per sink; ``nc`` is the
           dropped-row sentinel (contributes nowhere).
    feats: [Sq, F] f32.
    Returns [nc, F] f32 — matches
    ``jnp.zeros((nc + 1, F)).at[seg].add(feats)[:nc]`` to ~f32 accuracy.

    ``sb`` is the sink-block depth (the VMEM Khatri-Rao block is
    [F*128, sb] bf16: 4.7 MB at F=18, sb=1024). Non-divisible shapes are
    zero/sentinel-padded: padded sink rows carry the ``nc`` sentinel, and
    padded node ids (``>= nc``, including the sentinel itself when nc pads
    up to the 128-digit grid) are sliced off the result, so padding never
    aliases a real node.
    """
    sq, f = feats.shape
    sb = min(sb, sq)
    sq_pad = -(-sq // sb) * sb
    nc_pad = -(-nc // _L) * _L
    seg = seg.astype(jnp.int32)
    featsT = feats.astype(jnp.float32).T                 # [F, Sq]
    if sq_pad != sq:
        seg = jnp.pad(seg, (0, sq_pad - sq), constant_values=nc)
        featsT = jnp.pad(featsT, ((0, 0), (0, sq_pad - sq)))
    res = pl.pallas_call(
        functools.partial(_segsum_kernel, n_sb=sq_pad // sb, sb=sb,
                          nh=nc_pad // _L),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f, nc_pad), jnp.float32),
        interpret=interpret,
    )(seg[None, :], featsT)
    return res[:, :nc].T
