"""Train state + optimizer factory.

Reference semantics (``models/base_model_abc.py:24-64``): Adam with
betas (0.5, 0.999) (per-optimizer overrides, e.g. the segmentor's
(0.9, 0.999)), optional weight decay, and a per-epoch LR schedule that is
constant for ``epochs - epochs_decay`` epochs then decays linearly to 0.
The schedule multiplies a mutable hyperparameter so one compiled step serves
all epochs.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    mutables: Any  # non-param collections (e.g. spectral norm u vectors)
    step: jax.Array


def linear_decay_factor(epoch: int, max_epochs: int, epochs_decay: int) -> float:
    """Reference LambdaLR schedule (``base_model_abc.py:57-61``)."""
    if epoch < (max_epochs - epochs_decay):
        return 1.0
    return (max_epochs - epoch) * (1.0 / max(1, epochs_decay))


def make_optimizer(lr: float, betas=(0.5, 0.999), weight_decay: float = 0.0):
    """Adam chain with a mutable lr multiplier (set per epoch)."""
    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay
            else optax.identity(),
            optax.adam(learning_rate, b1=betas[0], b2=betas[1]),
        )
    )(learning_rate=lr)
    return tx


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning-rate hyperparameter in-place-ish."""
    return opt_state._replace(hyperparams={**opt_state.hyperparams,
                                           "learning_rate": lr})
