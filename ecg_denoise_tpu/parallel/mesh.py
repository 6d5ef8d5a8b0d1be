"""Device mesh + sharding rules (data parallel / tensor parallel).

The reference is single-GPU PyTorch with no distributed story whatsoever
(survey §2e census: no DDP/DataParallel/torch.distributed anywhere). The
TPU-native scaling design replaces that gap:

* Mesh axes ('data', 'model') over ICI.
* Data parallelism: batches sharded on 'data', parameters replicated;
  jit-SPMD inserts the gradient all-reduce (psum) automatically.
* Tensor parallelism (optional, 'model' axis): Megatron-style column/row
  sharding of the transformer projections — to_q/to_kv/fc1 kernels sharded
  on the output dim, proj/fc2 on the input dim — expressed as
  NamedSharding on the parameter pytree; XLA propagates and inserts the
  per-block psums. At RA-LENet scale (<= 128 channels) TP is never a
  throughput win; it exists so multi-chip sharding of every weight matrix is
  exercised end-to-end (and validated by __graft_entry__.dryrun_multichip).

All collectives ride the mesh (ICI); no host-side communication.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // n_model
    assert n_data * n_model <= n_total, (n_data, n_model, n_total)
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def shard_batch(arr, mesh: Mesh):
    """Shard the leading (batch) axis across 'data'."""
    return jax.device_put(arr, NamedSharding(mesh, P("data")))


def replicate_state(state, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    return jax.device_put(state, NamedSharding(mesh, P()))


# Megatron-style TP rules for the RA-LENet transformer stack: map a param
# path to the axis of its kernel to shard on 'model'.
_COL_PARALLEL = ("to_q", "to_kv", "fc1")  # shard output dim (last axis)
_ROW_PARALLEL = ("proj", "fc2")  # shard input dim (first axis)


def tp_param_spec(path, leaf) -> P:
    names = [getattr(p, "key", "") for p in path]
    in_attn_or_mlp = any(n in ("attn", "mlp") or n.startswith("qkv") for n in names)
    leafname = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else ""
    if in_attn_or_mlp and leaf.ndim >= 1:
        if parent in _COL_PARALLEL:
            if leafname == "kernel" and leaf.shape[-1] % 2 == 0:
                return P(None, "model")
            if leafname == "bias" and leaf.shape[0] % 2 == 0:
                return P("model")
        if parent in _ROW_PARALLEL and leafname == "kernel" and leaf.shape[0] % 2 == 0:
            return P("model", None)
    return P()


def shard_state_dp_tp(state, mesh: Mesh):
    """Apply TP sharding to params (rule-based) and replicate the rest.

    Optimizer state mirrors the param specs where shapes match (adam mu/nu
    are param-shaped); anything else is replicated.
    """
    param_specs = jax.tree_util.tree_map_with_path(tp_param_spec, state.params)

    def put_params(p, spec):
        return jax.device_put(p, NamedSharding(mesh, spec))

    params = jax.tree.map(put_params, state.params, param_specs)

    # Optimizer state: Adam's mu/nu mirror the params' structure — shard them
    # with the same specs; anything else (counts, empty states) replicates.
    def shard_opt(node):
        try:
            return jax.tree.map(put_params, node, param_specs)
        except (ValueError, TypeError):
            return jax.device_put(node, NamedSharding(mesh, P()))

    opt_state = tuple(
        type(s)(**{k: shard_opt(getattr(s, k)) for k in s._fields}) if hasattr(s, "_fields") else shard_opt(s)
        for s in state.opt_state
    ) if isinstance(state.opt_state, tuple) else shard_opt(state.opt_state)
    batch_stats = jax.device_put(state.batch_stats, NamedSharding(mesh, P()))
    step = jax.device_put(state.step, NamedSharding(mesh, P()))
    return state.replace(params=params, opt_state=opt_state, batch_stats=batch_stats, step=step)
