"""Unpaired image-translation algorithms (CycleGAN, CUT, NEGCUT, DCLGAN,
NICE-GAN). Populated incrementally; ``build`` dispatches by config name.
"""
from __future__ import annotations

from octa_tpu.utils.enums import Phase

_BUILDERS = {}


def register(name):
    def deco(cls):
        _BUILDERS[name] = cls
        return cls

    return deco


def build(name: str, config: dict, phase: Phase, **model_params):
    if name not in _BUILDERS:
        raise NotImplementedError(
            f"Algorithm {name} is not implemented yet. "
            f"Available: {sorted(_BUILDERS)}")
    return _BUILDERS[name](config=config, phase=phase, **model_params)
