"""Downstream-classifier metrics (binary N-vs-V beat task).

Match the reference test_cls.py:14-30: predictions are logits (B, 2),
labels are int {0,1}; `precision`/`f1_score` treat class 1 as positive.
Pure jnp so they can run on device; return scalars.
"""

from __future__ import annotations

import jax.numpy as jnp


def accuracy(pred_logits: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    pred = jnp.argmax(pred_logits, axis=1)
    return jnp.mean((pred == label).astype(jnp.float32))


def precision(pred_logits: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    pred = jnp.argmax(pred_logits, axis=1)
    tp = jnp.sum(pred * label)
    fp = jnp.sum(pred * (1 - label))
    return tp / (tp + fp)


def f1_score(pred_logits: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    pred = jnp.argmax(pred_logits, axis=1)
    tp = jnp.sum(pred * label)
    fp = jnp.sum(pred * (1 - label))
    fn = jnp.sum((1 - pred) * label)
    return tp / (tp + 0.5 * (fp + fn))
