"""Normalization helpers.

Equivalents of the reference's scattered normalizers: `np_norm` /
`norm_tensor` / `np_normlize` (reference local_utils/local_utils.py:258-266,
691-692) and the stillborn `Normalizer` class (data_utils.py:9-60, which
references an undefined eps — implemented correctly here). One definition
each, numpy or jax in/out preserved by dispatch on the input type.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _xp(x):
    """numpy for host arrays, jnp for anything jax-traced/device-resident.

    Dispatch on NOT-numpy rather than isinstance(jnp.ndarray): tracers and
    jax.Array classes vary across jax versions, np.ndarray does not."""
    return np if isinstance(x, (np.ndarray, list, tuple, float, int)) else jnp


def znorm(x, axis: int = -1, eps: float = 0.0):
    """Zero-mean unit-std over `axis` (the reference's np_norm semantics:
    per-signal standardization; std==0 rows pass through unscaled)."""
    xp = _xp(x)
    m = xp.mean(x, axis=axis, keepdims=True)
    s = xp.std(x, axis=axis, keepdims=True)
    denom = xp.where(s > eps, s, 1.0) if eps == 0.0 else s + eps
    return (x - m) / denom


def minmax_norm(x, axis: int = -1):
    """Scale to [0, 1] over `axis` (the reference np_normlize variant)."""
    xp = _xp(x)
    lo = xp.min(x, axis=axis, keepdims=True)
    hi = xp.max(x, axis=axis, keepdims=True)
    rng = hi - lo
    rng = xp.where(rng > 0, rng, 1.0)
    return (x - lo) / rng
