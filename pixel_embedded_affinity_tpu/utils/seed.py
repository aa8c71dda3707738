"""Determinism helpers (reference utils/utils.py:40-46 equivalent).

JAX is deterministic by construction given a PRNGKey; this seeds the host
(numpy / python random) side of the input pipeline.
"""

from __future__ import annotations

import random

import numpy as np


def setup_seed(seed: int):
    if seed is None or seed < 0:
        return
    random.seed(seed)
    np.random.seed(seed)
