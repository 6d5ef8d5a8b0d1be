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
  exercised end-to-end (validated numerically: tests/test_mesh.py asserts a
  DPxTP RaleNet train step == the single-device step, and
  __graft_entry__.dryrun_multichip asserts the same equality).

Optimizer state is sharded by PARAM-PATH matching, not container
heuristics: any optimizer leaf whose key path ends with a parameter's path
(Adam mu/nu, masked/multi_transform inner states, chained wrappers) gets
that parameter's spec; everything else replicates. This survives
optax.chain / optax.multi_transform (the frozen-mask transfer path).

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


def _path_names(path) -> tuple:
    return tuple(getattr(p, "key", getattr(p, "name", "")) for p in path)


def tp_param_spec(path, leaf, n_model: int = 2) -> P:
    """PartitionSpec for one param: Megatron col/row rules, gated on the
    actual 'model'-axis size dividing the sharded dim."""
    names = _path_names(path)
    in_attn_or_mlp = any(n in ("attn", "mlp") or n.startswith("qkv") for n in names)
    leafname = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else ""
    if in_attn_or_mlp and n_model > 1 and getattr(leaf, "ndim", 0) >= 1:
        if parent in _COL_PARALLEL:
            if leafname == "kernel" and leaf.shape[-1] % n_model == 0:
                return P(None, "model")
            if leafname == "bias" and leaf.shape[0] % n_model == 0:
                return P("model")
        if parent in _ROW_PARALLEL and leafname == "kernel" and leaf.shape[0] % n_model == 0:
            return P("model", None)
    return P()


def shard_state_dp_tp(state, mesh: Mesh):
    """Apply TP sharding to params (rule-based), mirror it onto the
    optimizer state by param-path suffix matching, replicate the rest."""
    n_model = int(mesh.shape.get("model", 1))
    spec_fn = lambda path, leaf: tp_param_spec(path, leaf, n_model)
    param_specs = jax.tree_util.tree_map_with_path(spec_fn, state.params)

    def put(leaf, spec):
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    params = jax.tree.map(put, state.params, param_specs)

    # Index param (spec, shape) by full key-path; optimizer leaves that END
    # with a param's path (['0','inner_states','train',...,'mu',
    # <param path...>]) carry param-shaped moments and get the param's spec.
    spec_by_path = {}
    flat_specs = jax.tree_util.tree_flatten_with_path(
        param_specs, is_leaf=lambda x: isinstance(x, P)
    )[0]
    flat_params = jax.tree_util.tree_flatten_with_path(state.params)[0]
    for (path, spec), (_, leaf) in zip(flat_specs, flat_params):
        spec_by_path[_path_names(path)] = (spec, leaf.shape)
    suffix_lengths = sorted({len(k) for k in spec_by_path}, reverse=True)

    def opt_leaf_spec(path, shape) -> P:
        names = _path_names(path)
        for L in suffix_lengths:
            if len(names) >= L and names[-L:] in spec_by_path:
                spec, pshape = spec_by_path[names[-L:]]
                return spec if shape == pshape else P()
        return P()

    def put_opt(path, leaf):
        if leaf is None or (not hasattr(leaf, "shape") and not np.isscalar(leaf)):
            return leaf  # MaskedNode / empty-state sentinels: leave as-is
        shape = getattr(leaf, "shape", ())
        return jax.device_put(
            leaf, NamedSharding(mesh, opt_leaf_spec(path, shape))
        )

    opt_state = jax.tree_util.tree_map_with_path(put_opt, state.opt_state)
    batch_stats = jax.device_put(state.batch_stats, NamedSharding(mesh, P()))
    step = jax.device_put(state.step, NamedSharding(mesh, P()))
    return state.replace(params=params, opt_state=opt_state,
                         batch_stats=batch_stats, step=step)
