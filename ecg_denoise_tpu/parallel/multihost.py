"""Multi-host (multi-process) scaffolding: DCN init + per-host data feeding.

The reference is a single-GPU program with no distributed story (SURVEY §2e);
the TPU-native obligation (SURVEY §5) is the standard JAX multi-host recipe:

* one Python process per host, connected over DCN by
  ``jax.distributed.initialize`` (coordinator address + process id/count);
* a global ``Mesh`` over *all* hosts' devices, laid out so the 'data' axis
  is contiguous per host — every host's batch shard lives on its own chips
  and gradient psums ride ICI within a slice, crossing DCN only at the
  slice boundary XLA chooses;
* per-host data feeding: each process loads only a strided subset of the
  windows (``process_shard``) and assembles the global batch with
  ``jax.make_array_from_process_local_data`` — no host ever materialises
  the full array (``global_batch``).

Everything degrades to a no-op on a single process: ``initialize()``
returns False without touching ``jax.distributed``, ``process_shard`` is
the identity, and ``global_batch`` is a plain sharded ``device_put``.
This file is unit-tested on CPU (tests/test_multihost.py); a real
multi-host run only needs the coordinator env vars set per host.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Guarded ``jax.distributed.initialize``.

    Arguments fall back to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID); on TPU pods with no explicit
    configuration jax can also auto-detect, but we only trigger that when
    the caller opted in AND a multi-process setup is actually described —
    a bare single process returns False and initialises nothing.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if not coordinator_address or not num_processes or num_processes <= 1:
        return False

    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_shard_indices(
    n_total: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> np.ndarray:
    """Indices of the windows THIS process should load: ``p, p+P, p+2P, …``
    truncated to a common length so every host holds the same count (a
    ragged global batch cannot form a jax.Array). With P=1 this is all
    indices — the single-process identity.
    """
    import jax

    p = jax.process_index() if process_index is None else process_index
    P = jax.process_count() if process_count is None else process_count
    if not 0 <= p < P:
        raise ValueError(f"process_index {p} not in [0, {P})")
    per_host = n_total // P
    if per_host == 0:
        raise ValueError(f"{n_total} windows cannot feed {P} processes")
    return np.arange(p, p + per_host * P, P)


def process_shard(*arrays, process_index=None, process_count=None):
    """Slice each array's leading axis to this process's strided shard."""
    idx = process_shard_indices(
        arrays[0].shape[0], process_index, process_count
    )
    out = tuple(a[idx] for a in arrays)
    return out[0] if len(out) == 1 else out


def global_batch(local, mesh):
    """Assemble a global batch-sharded ``jax.Array`` from this process's
    local shard. Single-process: a plain device_put onto P('data') —
    bitwise the same data layout, so the jitted epoch is identical either
    way.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(local))
