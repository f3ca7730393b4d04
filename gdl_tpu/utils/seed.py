"""Deterministic seeding (reference utils/utils.py:7-12 `setup_seed`).

JAX is deterministic by construction given the PRNG key threading; this
seeds numpy/python for the host-side pipeline (shuffling, file sampling)
and returns the root jax key from which all device randomness derives.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def setup_seed(seed: int) -> jax.Array:
    np.random.seed(seed)
    random.seed(seed)
    return jax.random.PRNGKey(seed)
