"""Training state container + constructor.

Replaces the reference's implicit (model, optimizer) pair
(reference: denoise_train.py:20-24 — model.cuda() + Adam(lr=1e-3)) with an
immutable pytree suited to jit/scan/pjit: params, batch_stats (BatchNorm
running stats), optimizer state, step counter.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    def replace_(self, **kw):
        return self.replace(**kw)


def create_train_state(
    model,
    rng: jax.Array,
    sample_input: jnp.ndarray,
    learning_rate: float = 1e-3,
    optimizer: Optional[optax.GradientTransformation] = None,
    frozen_mask: Any = None,
    variables: Any = None,
):
    """Initialise model variables and optimizer.

    Adam lr=1e-3 matches the reference (denoise_train.py:24). If
    `frozen_mask` (a bool pytree, True = frozen) is given, those parameters
    get zero updates (the transfer-learning frozen-core path,
    reference: ralenet_12leads.py:694-696).
    """
    if variables is None:
        # jitted init: one compiled program instead of hundreds of eager op
        # dispatches (which are minutes-slow over a remote-TPU tunnel).
        variables = jax.jit(lambda r, s: model.init(r, s, train=True))(
            rng, sample_input
        )
    params = variables["params"]
    # Plain dict (not FrozenDict): a model without BatchNorm returns {} from
    # apply(mutable=['batch_stats']), and lax.scan requires the carry's
    # pytree TYPES to match — FrozenDict() in / dict out broke the ACDAE
    # train scan.
    batch_stats = variables.get("batch_stats", {})
    tx = optimizer or optax.adam(learning_rate)
    if frozen_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            jax.tree.map(lambda frozen: "frozen" if frozen else "train", frozen_mask),
        )
    opt_state = tx.init(params)
    state = TrainState(params=params, batch_stats=batch_stats, opt_state=opt_state,
                       step=jnp.zeros((), jnp.int32))
    return state, tx
