"""Jitted train/eval steps and whole-epoch scan functions.

TPU-first redesign of the reference training loop
(reference: denoise_train.py:36-89). The reference pays, per step: an H2D
batch copy (denoise_train.py:47-49), a D2H loss sync (:54), and python
dispatch for fwd/bwd/opt/metrics. Here the full train/test splits live in
HBM and one jitted `lax.scan` runs an entire epoch — forward, backward,
Adam update, BatchNorm stat updates, and per-batch SNR/RMSE — with a single
host transfer of the epoch's metric means at the end.

Loss = mean MSE (reference denoise_train.py:53). Metrics use the same
on-device formulas as the reference's evaluate.py (see metrics/denoise.py).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ecg_denoise_tpu.metrics import SNR, RMSE
from ecg_denoise_tpu.train.state import TrainState


def make_epoch_fns(model, tx: optax.GradientTransformation, donate: bool = True,
                   detect_r_pos: bool = False):
    """Build (train_epoch, eval_epoch) jitted functions for `model`.

    train_epoch(state, noisy, clean, key) -> (state, metrics dict)
        noisy/clean: (N, C, L) device arrays; the epoch shuffles on device,
        drops the ragged tail (N % batch) like a drop_last loader, and scans.
    eval_epoch(state, noisy, clean) -> metrics dict
        processes all N samples (tail handled by masked padding).
    Metrics are epoch means of the per-sample SNR/RMSE plus mean loss.

    detect_r_pos=True runs the on-device R-peak detector (data/rpeaks.py)
    on every input batch and feeds per-window positions to the model's
    R-wave attention bias (RaleNet family's r_pos hook) — the paper's
    namesake mechanism, driven; the reference only ever uses the fixed
    centre (its R_pos hook is never supplied by any entry script).

    (The round-2/3 fast_variant / packed_variant alternate-forward
    routings were retired in round 4 after losing their final on-chip
    A/Bs — RESULTS.md "retired engines"; git pre-1654be4 has the code.)
    """
    if detect_r_pos:
        from ecg_denoise_tpu.data.rpeaks import detect_r_peaks

        r_kw = lambda x: {"r_pos": detect_r_peaks(x)}
    else:
        r_kw = lambda x: {}

    def apply_train(params, batch_stats, x):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=True,
            mutable=["batch_stats"],
            **r_kw(x),
        )
        return out, mut["batch_stats"]

    def apply_eval(variables, x):
        return model.apply(variables, x, train=False, **r_kw(x))

    def loss_fn(params, batch_stats, data, target):
        pred, new_stats = apply_train(params, batch_stats, data)
        loss = jnp.mean((pred.astype(jnp.float32) - target) ** 2)
        return loss, (pred, new_stats)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def _step_core(params, batch_stats, data, target):
        """loss/grads/new-BN-stats/metrics for one batch (single device)."""
        (loss, (pred, new_stats)), grads = grad_fn(params, batch_stats,
                                                   data, target)
        return (loss, grads, new_stats,
                jnp.mean(SNR(target, pred)), jnp.mean(RMSE(target, pred)))

    def train_step(state: TrainState, batch):
        data, target = batch
        loss, grads, new_stats, snr, rmse = _step_core(
            state.params, state.batch_stats, data, target)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        state = state.replace(
            params=new_params, batch_stats=new_stats, opt_state=new_opt, step=state.step + 1
        )
        return state, (loss, snr, rmse)

    @partial(jax.jit, static_argnums=(4,), donate_argnums=(0,) if donate else ())
    def train_epoch(state: TrainState, noisy, clean, key, batch_size: int = 32):
        n = noisy.shape[0]
        n_batches = n // batch_size
        perm = jax.random.permutation(key, n)[: n_batches * batch_size]
        nb = noisy[perm].reshape(n_batches, batch_size, *noisy.shape[1:])
        cb = clean[perm].reshape(n_batches, batch_size, *clean.shape[1:])
        state, (losses, snrs, rmses) = jax.lax.scan(train_step, state, (nb, cb))
        return state, {
            "loss": jnp.mean(losses),
            "snr": jnp.mean(snrs),
            "rmse": jnp.mean(rmses),
        }

    @partial(jax.jit, static_argnums=(3,))
    def eval_epoch(state: TrainState, noisy, clean, batch_size: int = 32):
        n = noisy.shape[0]
        n_batches = -(-n // batch_size)
        pad = n_batches * batch_size - n
        noisy_p = jnp.pad(noisy, ((0, pad), (0, 0), (0, 0)))
        # Pad targets with ones (not zeros) so padded rows' SNR stays finite;
        # their weight is 0 so they do not contribute to the means.
        clean_p = jnp.pad(clean, ((0, pad), (0, 0), (0, 0)), constant_values=1.0)
        weights = jnp.pad(jnp.ones((n,)), (0, pad))
        nb = noisy_p.reshape(n_batches, batch_size, *noisy.shape[1:])
        cb = clean_p.reshape(n_batches, batch_size, *clean.shape[1:])
        wb = weights.reshape(n_batches, batch_size)
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        def step(carry, batch):
            data, target, w = batch
            pred = apply_eval(variables, data).astype(jnp.float32)
            loss_num = jnp.sum(w[:, None, None] * (pred - target) ** 2)
            snr = jnp.sum(SNR(target, pred) * w)
            rmse = jnp.sum(RMSE(target, pred) * w)
            return carry, (loss_num, snr, rmse)

        _, (loss_nums, snrs, rmses) = jax.lax.scan(step, None, (nb, cb, wb))
        denom = jnp.float32(n)
        per_elem = jnp.float32(noisy.shape[1] * noisy.shape[2])
        return {
            "loss": jnp.sum(loss_nums) / (denom * per_elem),
            "snr": jnp.sum(snrs) / denom,
            "rmse": jnp.sum(rmses) / denom,
        }

    return train_epoch, eval_epoch


def make_augmented_epoch_fn(model, tx: optax.GradientTransformation,
                            noise_record, snr_db: float, donate: bool = True):
    """Train-epoch fn that mixes noise ON DEVICE inside the jitted scan.

    TPU-native extension (no reference counterpart — the reference trains on
    a fixed pre-mixed cache): the clean windows and the long noise record
    live in HBM; every epoch each window gets a FRESH random noise slice
    scaled to the target SNR (data/noise.py::jax_snr_noise_add), fused into
    the same scan as forward/backward/Adam. Infinite augmentation at zero
    host cost.

    train_epoch(state, clean, key, batch_size) -> (state, metrics)
    """
    from ecg_denoise_tpu.data.noise import jax_snr_noise_add

    noise_record = jnp.asarray(noise_record, jnp.float32)

    def apply_train(params, batch_stats, x):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, train=True, mutable=["batch_stats"],
        )
        return out, mut["batch_stats"]

    def loss_fn(params, batch_stats, data, target):
        pred, new_stats = apply_train(params, batch_stats, data)
        loss = jnp.mean((pred.astype(jnp.float32) - target) ** 2)
        return loss, (pred, new_stats)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(carry, batch):
        state, key = carry
        clean = batch
        key, mix_key = jax.random.split(key)
        noisy = jax_snr_noise_add(clean, noise_record, snr_db, mix_key)
        (loss, (pred, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, noisy, clean
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        state = state.replace(
            params=optax.apply_updates(state.params, updates),
            batch_stats=new_stats, opt_state=new_opt, step=state.step + 1,
        )
        metrics = (loss, jnp.mean(SNR(clean, pred)), jnp.mean(RMSE(clean, pred)))
        return (state, key), metrics

    @partial(jax.jit, static_argnums=(3,), donate_argnums=(0,) if donate else ())
    def train_epoch(state: TrainState, clean, key, batch_size: int = 32):
        n = clean.shape[0]
        n_batches = n // batch_size
        key, perm_key = jax.random.split(key)
        perm = jax.random.permutation(perm_key, n)[: n_batches * batch_size]
        cb = clean[perm].reshape(n_batches, batch_size, *clean.shape[1:])
        (state, _), (losses, snrs, rmses) = jax.lax.scan(
            train_step, (state, key), cb
        )
        return state, {
            "loss": jnp.mean(losses),
            "snr": jnp.mean(snrs),
            "rmse": jnp.mean(rmses),
        }

    return train_epoch


def make_denoise_fn(model, variables, batch_size: Optional[int] = None):
    """Jitted pure inference fn x -> denoised(x) for eval/serving paths."""

    @jax.jit
    def denoise(x):
        return model.apply(variables, x, train=False)

    return denoise
