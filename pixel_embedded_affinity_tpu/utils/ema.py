"""Mean-teacher EMA weights + ramp schedules.

Ports of utils/utils.py:49-81: update_ema_variables (alpha = min(1 - 1/(t+1),
decay)) for the sharing_weights=False mean-teacher mode, plus the sigmoid /
linear / cosine consistency ramps.
"""

from __future__ import annotations

import numpy as np


def update_ema_variables(params, ema_params, alpha: float, global_step: int):
    """Functional EMA update: returns new teacher params pytree."""
    import jax

    a = min(1.0 - 1.0 / (global_step + 1), alpha)
    return jax.tree_util.tree_map(lambda e, p: e * a + p * (1.0 - a),
                                  ema_params, params)


def sigmoid_rampup(current: float, rampup_length: float) -> float:
    if rampup_length == 0:
        return 1.0
    current = np.clip(current, 0.0, rampup_length)
    phase = 1.0 - current / rampup_length
    return float(np.exp(-5.0 * phase * phase))


def linear_rampup(current: float, rampup_length: float) -> float:
    if rampup_length == 0:
        return 1.0
    return float(np.clip(current / rampup_length, 0.0, 1.0))


def cosine_rampdown(current: float, rampdown_length: float) -> float:
    return float(0.5 * (np.cos(np.pi * current / rampdown_length) + 1))
