"""Checkpoint save/restore with the reference's filename contract.

The reference saves bare state_dicts every 10 epochs to
model_save/{name}/{name}_{epoch}_{noise}_intensity{k}.pth
(reference: denoise_train.py:90-94) and never saves optimizer state (its
resume path is also buggy — denoise_train.py:23 assigns load_state_dict's
return to `model`). This framework keeps the same directory/filename scheme
(extension .msgpack) but checkpoints the FULL TrainState — params, BatchNorm
stats, optimizer state, step — so resume is exact.

`find_model` mirrors the reference's checkpoint-discovery helper
(local_utils/local_utils.py:700-715): glob a directory, pick by name/epoch
or latest.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import serialization


def checkpoint_path(model_dir: str, model_name: str, epoch: int, noise_name: str, noise_intensity: int) -> str:
    return os.path.join(
        model_dir,
        model_name,
        f"{model_name}_{epoch}_{noise_name}_intensity{noise_intensity}.msgpack",
    )


def save_checkpoint(path: str, state: Any) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = serialization.to_bytes(state)
    with open(path, "wb") as f:
        f.write(payload)
    return path


def load_checkpoint(path: str, target: Any) -> Any:
    with open(path, "rb") as f:
        restored = serialization.from_bytes(target, f.read())
    # from_bytes yields NUMPY leaves; convert to device arrays. A numpy
    # param fancy-indexed by a traced index inside jit calls __array__ on
    # the tracer and crashes (bit the rel-pos table gather in test_cls).
    return jax.tree.map(jnp.asarray, restored)


def load_params(path: str, target_state: Any):
    """Restore only (params, batch_stats) from a full-state checkpoint —
    the test_cls / transfer-learning consumption pattern."""
    state = load_checkpoint(path, target_state)
    return state.params, state.batch_stats


def load_variables(path: str, variables_template: dict) -> dict:
    """Restore inference variables {'params', 'batch_stats'} WITHOUT a
    full TrainState template.

    A full-state restore needs the reader's opt_state tree to match the
    writer's — which differs whenever the training run used a frozen-
    parameter mask (optax.multi_transform wraps the opt_state; the
    transfer-learning checkpoints hit this). Serving only consumes
    params/batch_stats, so restore the raw msgpack dict and re-type just
    those subtrees against the template."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    out = {}
    for key in variables_template:
        if key not in raw:
            raise ValueError(f"checkpoint {path} has no '{key}' "
                             f"(keys: {sorted(raw)})")
        out[key] = serialization.from_state_dict(variables_template[key],
                                                 raw[key], name=key)
    return jax.tree.map(jnp.asarray, out)


def find_model(model_path: str, model_name: Optional[str] = None, epoch: Optional[int] = None) -> Optional[str]:
    """Find a checkpoint file by name/epoch, else the latest epoch."""
    pats = os.path.join(model_path, "*.msgpack")
    cands = glob.glob(pats)
    if model_name:
        cands = [c for c in cands if os.path.basename(c).startswith(model_name + "_")]
    if not cands:
        return None
    def ep(c):
        m = re.search(r"_(\d+)_", os.path.basename(c))
        return int(m.group(1)) if m else -1
    if epoch is not None:
        for c in cands:
            if ep(c) == epoch:
                return c
        return None
    return max(cands, key=ep)
