"""Jitted classifier training (cross-entropy) — whole-epoch scan functions.

TPU-native equivalent of the reference's classifier loop
(reference train_cls.py:54-76: Adam lr=1e-3, cross-entropy, 20 epochs,
batch 32): the class dataset lives in HBM, each epoch is one jitted
`lax.scan` with a single host transfer for the epoch metrics — same design
as the denoiser loop in train/steps.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from ecg_denoise_tpu.train.state import TrainState


def make_cls_epoch_fns(model, tx: optax.GradientTransformation):
    """Build (train_epoch, eval_epoch) for a logits-producing classifier.

    train_epoch(state, data, label, key, batch_size) -> (state, metrics)
    eval_epoch(state, data, label, batch_size) -> (metrics, logits)
        metrics: {'loss', 'acc'}; eval also returns the full (N, 2) logits
        so precision/F1 can be computed host-side over the whole split
        (matching the reference's whole-epoch metric lists, test_cls.py).
    """

    def loss_fn(params, batch_stats, data, label):
        logits, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            data, train=True, mutable=["batch_stats"],
        )
        loss = jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), label
            )
        )
        return loss, (logits, mut["batch_stats"])

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, batch):
        data, label = batch
        (loss, (logits, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, data, label
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        state = state.replace(
            params=optax.apply_updates(state.params, updates),
            batch_stats=new_stats, opt_state=new_opt, step=state.step + 1,
        )
        acc = jnp.mean((jnp.argmax(logits, axis=1) == label).astype(jnp.float32))
        return state, (loss, acc)

    @partial(jax.jit, static_argnums=(4,))
    def train_epoch(state: TrainState, data, label, key, batch_size: int = 32):
        n = data.shape[0]
        n_batches = n // batch_size
        perm = jax.random.permutation(key, n)[: n_batches * batch_size]
        db = data[perm].reshape(n_batches, batch_size, *data.shape[1:])
        lb = label[perm].reshape(n_batches, batch_size)
        state, (losses, accs) = jax.lax.scan(train_step, state, (db, lb))
        return state, {"loss": jnp.mean(losses), "acc": jnp.mean(accs)}

    @partial(jax.jit, static_argnums=(3,))
    def eval_epoch(state: TrainState, data, label, batch_size: int = 128):
        n = data.shape[0]
        n_batches = -(-n // batch_size)
        pad = n_batches * batch_size - n
        data_p = jnp.pad(data, ((0, pad), (0, 0), (0, 0)))
        db = data_p.reshape(n_batches, batch_size, *data.shape[1:])
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        def step(carry, d):
            return carry, model.apply(variables, d, train=False)

        _, logits = jax.lax.scan(step, None, db)
        logits = logits.reshape(n_batches * batch_size, -1)[:n]
        loss = jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), label
            )
        )
        acc = jnp.mean((jnp.argmax(logits, axis=1) == label).astype(jnp.float32))
        return {"loss": loss, "acc": acc}, logits

    return train_epoch, eval_epoch
