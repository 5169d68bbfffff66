"""Determinism helpers (rebuild of utils.py:21-27).

JAX is deterministic by construction given a PRNGKey; this seeds the host-side
RNGs the data pipeline uses and returns the root device key.
"""

from __future__ import annotations

import os
import random

import numpy as np
import jax


def seeding(seed: int):
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def host_rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)
