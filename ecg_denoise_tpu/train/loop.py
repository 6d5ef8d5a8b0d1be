"""The training loop — reference-equivalent surface, TPU-native core.

Mirrors the reference `train()` (reference: denoise_train.py:15-103):
Adam(lr=1e-3), MSE loss, per-epoch train + eval SNR/RMSE means, checkpoint
every 10 epochs under model_save/{name}/..., a final result line appended to
output.txt in the reference's exact format, and the same return value
(train_snr_list, test_snr_list, train_rmse_list, test_rmse_list).

TPU-native core: the splits are device_put once; each epoch is ONE jitted
scan (see train/steps.py). With data parallelism, pass `mesh` — arrays are
sharded batch-wise and the same jitted epoch runs SPMD with XLA-inserted
gradient psums (see parallel/mesh.py).
"""

from __future__ import annotations

import os
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ecg_denoise_tpu.train.state import create_train_state
from ecg_denoise_tpu.train.steps import make_epoch_fns
from ecg_denoise_tpu.train.checkpoint import checkpoint_path, save_checkpoint, load_checkpoint


def fit(
    model,
    train_noisy: np.ndarray,
    train_clean: np.ndarray,
    test_noisy: np.ndarray,
    test_clean: np.ndarray,
    *,
    epochs: int = 100,
    batch_size: int = 32,
    learning_rate: float = 1e-3,
    model_name: str = "model",
    noise_name: str = "bw",
    noise_intensity: int = -4,
    seed: int = 2023,
    model_save_dir: str = "./model_save",
    output_file: str = "./output.txt",
    checkpoint_every: int = 10,
    resume_path: Optional[str] = None,
    init_variables: Optional[tuple] = None,
    frozen_mask: Any = None,
    mesh=None,
    log_every: int = 1,
    verbose: bool = True,
    r_pos_mode: Optional[str] = None,
):
    # On a multi-host mesh every process runs fit() in lockstep; only
    # process 0 may touch shared storage (checkpoints, output.txt) or
    # print, otherwise P hosts race on the same paths and duplicate every
    # result line (advisor r2 medium finding). Single-process: index 0.
    is_primary = jax.process_index() == 0
    verbose = verbose and is_primary
    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    sample = jnp.asarray(train_noisy[:2])
    # init_variables=(params, batch_stats) skips re-initialising the model —
    # the transfer-learning path grafts a pretrained frozen core into an
    # already-initialised tree (double init is minutes-slow on TPU).
    state, tx = create_train_state(
        model, init_key, sample, learning_rate=learning_rate,
        frozen_mask=frozen_mask,
        variables=(
            {"params": init_variables[0], "batch_stats": init_variables[1]}
            if init_variables is not None else None
        ),
    )
    if resume_path:
        state = load_checkpoint(resume_path, state)

    if mesh is not None:
        from ecg_denoise_tpu.parallel.mesh import (
            replicate_state,
            shard_state_dp_tp,
        )
        from ecg_denoise_tpu.parallel.multihost import global_batch

        if int(mesh.shape.get("model", 1)) > 1:
            # Tensor parallelism: Megatron col/row shardings on the
            # transformer projections; XLA inserts the per-block psums.
            state = shard_state_dp_tp(state, mesh)
        else:
            state = replicate_state(state, mesh)
        # global_batch == shard_batch on one process; on a multi-host mesh
        # it assembles the global array from this host's local shard
        # (callers feed per-host data via multihost.process_shard).
        put = lambda a: global_batch(np.asarray(a), mesh)
    else:
        put = lambda a: jax.device_put(jnp.asarray(a))

    tr_n, tr_c = put(train_noisy), put(train_clean)
    te_n, te_c = put(test_noisy), put(test_clean)

    from ecg_denoise_tpu.utils.logit_audit import maxfree_active, run_maxfree_guard

    if maxfree_active():
        # Guard the ECG_ATTN_MAXFREE escape hatch on REAL data before the
        # loop: the kernel variant is only exact below logit 60 and the
        # trained flagship violates it (VERDICT r4 item 5).
        audit_vars = {"params": state.params}
        if state.batch_stats:
            audit_vars["batch_stats"] = state.batch_stats
        run_maxfree_guard(model, audit_vars,
                          tr_n[: min(batch_size, tr_n.shape[0])],
                          context="train")

    train_epoch, eval_epoch = make_epoch_fns(
        model, tx, detect_r_pos=(r_pos_mode == "detect"),
    )

    train_snr_list, test_snr_list = [], []
    train_rmse_list, test_rmse_list = [], []
    t0 = time.time()
    test_metrics = {"snr": float("nan"), "rmse": float("nan")}
    for epoch in range(epochs):
        key, ep_key = jax.random.split(key)
        state, train_metrics = train_epoch(state, tr_n, tr_c, ep_key, batch_size)
        test_metrics = eval_epoch(state, te_n, te_c, batch_size)
        train_metrics = jax.device_get(train_metrics)
        test_metrics = jax.device_get(test_metrics)
        train_snr_list.append(float(train_metrics["snr"]))
        test_snr_list.append(float(test_metrics["snr"]))
        train_rmse_list.append(float(train_metrics["rmse"]))
        test_rmse_list.append(float(test_metrics["rmse"]))
        if verbose and (epoch + 1) % log_every == 0:
            dt = time.time() - t0
            print(
                f"[{model_name}] epoch {epoch + 1:03d}/{epochs} "
                f"loss={train_metrics['loss']:.5f} "
                f"train_snr={train_metrics['snr']:.3f} test_snr={test_metrics['snr']:.3f} "
                f"test_rmse={test_metrics['rmse']:.4f} ({dt:.1f}s)"
            )
        if (epoch + 1) % checkpoint_every == 0 and is_primary:
            path = checkpoint_path(model_save_dir, model_name, epoch, noise_name, noise_intensity)
            save_checkpoint(path, state)
            if verbose:
                print(f"saved {path}")

    if output_file and is_primary:
        os.makedirs(os.path.dirname(os.path.abspath(output_file)), exist_ok=True)
        with open(output_file, "a") as f:
            # Reference format (denoise_train.py:100-101).
            f.write(
                f"{model_name}_{epochs - 1}_{noise_name}_intensity{noise_intensity}:"
                f"snr:{test_metrics['snr']}, rmse:{test_metrics['rmse']}\n"
            )

    return state, (train_snr_list, test_snr_list, train_rmse_list, test_rmse_list)
