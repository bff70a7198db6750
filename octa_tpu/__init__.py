"""octa_tpu — TPU-native (JAX/XLA/Pallas/pjit) framework for annotation-free
OCTA retinal vessel segmentation.

A from-scratch rebuild of the capabilities of ``aiforvision/OCTA-autosegmentation``
(reference mounted at /root/reference), designed TPU-first:

- ``octa_tpu.sim``     — batched, jit-compiled space-colonization vessel growth
  (replaces vessel_graph_generation/greenhouse.py's pointer-tree loop).
- ``octa_tpu.ops``     — Pallas/XLA kernels: line-splat rasterizer, soft/exact
  skeletonization, morphology, classical vesselness filters.
- ``octa_tpu.data``    — config-driven pipeline with on-device fused augmentation
  (replaces MONAI CPU-worker transform chains in data/data_transforms.py).
- ``octa_tpu.models``  — Flax networks + pure-function training algorithms
  (DynUNet, ResnetGenerator9, PatchGAN, CycleGAN/CUT/NegCUT/DCLGAN/NICE-GAN).
- ``octa_tpu.parallel``— jax.sharding Mesh/pjit data-parallel utilities.
- ``octa_tpu.train``   — training engine, optax optimizers, checkpointing.
- ``octa_tpu.utils``   — losses, metrics (Dice/clDice/IoU/AUC/...), config.

Config files are schema-compatible with the reference's YAML corpus
(see /root/reference/configs/config_template.yml).
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

if _os.environ.get("OCTA_TPU_PLATFORM"):
    # Working platform override for environments where a sitecustomize pins
    # JAX_PLATFORMS before user code runs (e.g. force the CPU backend with
    # OCTA_TPU_PLATFORM=cpu for debugging / cross-backend comparison).
    # Must happen before any jax computation.
    _jax.config.update("jax_platforms", _os.environ["OCTA_TPU_PLATFORM"])

if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    # Persistent compilation cache: compiles of the big growth/training
    # programs take minutes through the remote-compile tunnel; caching them
    # on disk cuts repeat process startup ~5x (measured 305s -> 66s).
    try:
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.expanduser("~/.cache/octa_tpu/jax_cache"))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
