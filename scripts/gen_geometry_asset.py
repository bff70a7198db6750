#!/usr/bin/env python
"""Regenerate the bundled oxygen-sampling geometry asset.

The reference ships ``vessel_graph_generation/geometries/
slab_oxy_sample_3mm.npy`` — a (76, 76, 1) boolean slab mask loaded by
``simulation_space.py:29-37`` as the fixed oxygen-sample geometry. The
mask is exactly the SimulationSpace's own analytic FAZ carve
(``simulation_space.py:43-46``) evaluated at the 3 mm dataset's mean
parameters: GEOMETRY_SIZE=76, FAZ_center=(0.5, 0.5), and the mean FAZ
radius 0.44/param_scale(=3) — i.e. ``dist² > (0.44/3 · 76 · 0.5)²``.
We regenerate it from those first principles rather than copying the
binary.

Usage: python scripts/gen_geometry_asset.py
Writes: octa_tpu/sim/geometries/slab_oxy_sample_3mm.npy
"""
import os

import numpy as np

GEOMETRY_SIZE = 76
FAZ_CENTER = (0.5, 0.5)
FAZ_RADIUS = 0.44 / 3  # mean of FAZ_radius_bound / param_scale

out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "octa_tpu", "sim", "geometries",
                   "slab_oxy_sample_3mm.npy")
os.makedirs(os.path.dirname(out), exist_ok=True)

cy, cx = (FAZ_CENTER[0] * GEOMETRY_SIZE, FAZ_CENTER[1] * GEOMETRY_SIZE)
r_vox = FAZ_RADIUS * GEOMETRY_SIZE * 0.5
y, x = np.ogrid[:GEOMETRY_SIZE, :GEOMETRY_SIZE]
mask = ((x - cx) ** 2 + (y - cy) ** 2 > r_vox ** 2)[..., None]

np.save(out, mask)
print(f"{out}: shape {mask.shape}, dtype {mask.dtype}, "
      f"open fraction {mask.mean():.4f}")
