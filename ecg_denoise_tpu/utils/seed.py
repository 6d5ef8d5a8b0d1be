"""Seeding — the external `random_seed` equivalent.

The reference calls `global_utils.random_seed(2023)` (reference main.py:24)
to seed python/numpy/torch. JAX is functional (explicit PRNGKey threading),
so this seeds the two stateful host RNGs the data pipeline uses and returns
the matching PRNGKey for the jitted side.
"""

from __future__ import annotations

import random

import numpy as np


def random_seed(seed: int = 2023):
    """Seed python + numpy global RNGs; return jax.random.PRNGKey(seed)."""
    random.seed(seed)
    np.random.seed(seed)
    import jax

    return jax.random.PRNGKey(seed)
