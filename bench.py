#!/usr/bin/env python
"""Benchmark: full synthetic-OCTA pipeline throughput on one chip.

Measures 1216² images/sec/chip across the on-device pipeline stages the
framework currently covers end-to-end:
  vessel-graph rasterization (304² input + 1216² label splats)
  -> noise-model / GAN contrast adaptation (resnetGenerator9 @ 304²)
  -> DynUNet segmentation at 1216² -> sigmoid+threshold post-processing.

Baseline (BASELINE.md north star): 500 samples end-to-end in <2 min on a
v5e-8 = 0.521 img/s/chip. vs_baseline = value / 0.521.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import glob
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from octa_tpu.models import noise_model as nm
    from octa_tpu.models.dynunet import DynUNet
    from octa_tpu.models.resnet_gan import resnetGenerator9
    from octa_tpu.ops import raster

    BATCH = 4
    N_IMAGES = 32
    RES_IN, RES_LAB = 304, 1216

    # --- load + pad graphs (host prep, excluded from the timed region the
    # same way the reference excludes dataset download; CSV parse is ~ms) ---
    paths = sorted(glob.glob("/root/reference/datasets/vessel_graphs/*.csv"))
    paths = (paths * ((N_IMAGES // max(len(paths), 1)) + 1))[:N_IMAGES]
    graphs = [raster.parse_graph_csv(p) for p in paths]
    e_max = max(len(g["radius"]) for g in graphs)
    e_pad = -(-e_max // 2048) * 2048

    def prep(g):
        n1, n2, r = g["node1"], g["node2"], g["radius"]
        keep = np.ones(len(r), bool)
        a_in = np.stack([n1[:, 0] * RES_IN, n1[:, 1] * RES_IN], -1)
        b_in = np.stack([n2[:, 0] * RES_IN, n2[:, 1] * RES_IN], -1)
        a_lab = a_in * (RES_LAB / RES_IN)
        b_lab = b_in * (RES_LAB / RES_IN)
        w_in = r * 1.3 * RES_IN * (100 / 72)
        w_lab = r * 1.3 * RES_LAB * (100 / 72)
        out = []
        for a, b, w in ((a_in, b_in, w_in), (a_lab, b_lab, w_lab)):
            ap, bp, wp, vp = raster.pad_edges(a, b, w, keep, multiple=e_pad)
            out.append((ap[:e_pad], bp[:e_pad], wp[:e_pad], vp[:e_pad]))
        return out

    prepped = [prep(g) for g in graphs]
    a_in = np.stack([p[0][0] for p in prepped])
    b_in = np.stack([p[0][1] for p in prepped])
    w_in = np.stack([p[0][2] for p in prepped])
    v_in = np.stack([p[0][3] for p in prepped])
    a_lab = np.stack([p[1][0] for p in prepped])
    b_lab = np.stack([p[1][1] for p in prepped])
    w_lab = np.stack([p[1][2] for p in prepped])
    v_lab = np.stack([p[1][3] for p in prepped])

    # --- networks ---
    gen = resnetGenerator9(dtype=jnp.bfloat16)
    seg = DynUNet(spatial_dims=2, in_channels=1, out_channels=1,
                  kernel_size=[3] * 5, strides=[1, 2, 2, 2, 1],
                  upsample_kernel_size=[1, 2, 2, 2, 1], dtype=jnp.bfloat16)
    gv = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    sv = seg.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 1)))
    bg = jnp.asarray(
        np.random.default_rng(0).random((BATCH, RES_IN, RES_IN), np.float32))

    on_tpu = jax.default_backend() in ("tpu", "axon")

    def splat2d(a, b, w, v, res, k):
        if on_tpu:
            from octa_tpu.ops.pallas_splat import splat_lines_2d_pallas
            return splat_lines_2d_pallas(a, b, w, v, height=res, width=res,
                                         tile=128, k_max=k, span_=2)
        return jax.vmap(lambda aa, bb, ww, vv: raster.splat_lines_2d(
            aa, bb, ww, vv, height=res, width=res, tile=128, k_max=k,
            chunk=16))(a, b, w, v)

    @jax.jit
    def pipeline(ai, bi, wi, vi, al, bl, wl, vl, rng):
        # 1. rasterize input (304²) and label (1216²)
        img = splat2d(ai, bi, wi, vi, RES_IN, 4096)
        lab = splat2d(al, bl, wl, vl, RES_LAB, 512)
        lab = (lab > 0.1).astype(jnp.float32)
        # 2. contrast adaptation: handcrafted noise model + GAN generator
        params = nm.sample_noise_params(rng, img.shape[0])
        noised = nm.apply_noise_model(params, rng, img, bg)
        fake = gen.apply(gv, noised[..., None].astype(jnp.bfloat16))
        # 3. segmentation at 1216²
        up = jax.image.resize(fake, (fake.shape[0], RES_LAB, RES_LAB, 1),
                              "linear")
        logits = seg.apply(sv, up)
        pred = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
        return pred, lab

    rng = jax.random.PRNGKey(0)
    n_batches = N_IMAGES // BATCH

    def run_epoch():
        outs = []
        for i in range(n_batches):
            s = slice(i * BATCH, (i + 1) * BATCH)
            pred, lab = pipeline(a_in[s], b_in[s], w_in[s], v_in[s],
                                 a_lab[s], b_lab[s], w_lab[s], v_lab[s],
                                 jax.random.fold_in(rng, i))
            outs.append(pred)
        jax.block_until_ready(outs)
        return outs

    run_epoch()  # warmup/compile
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        run_epoch()
    dt = time.perf_counter() - t0
    imgs_per_sec = N_IMAGES * reps / dt

    baseline = 500 / 120 / 8  # BASELINE.md: 500 imgs in <2min on v5e-8
    print(json.dumps({
        "metric": "pipeline_1216px_images_per_sec_per_chip",
        "value": round(imgs_per_sec, 3),
        "unit": "img/s/chip",
        "vs_baseline": round(imgs_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
