"""Multi-host scaffolding (parallel/multihost.py) — CPU-testable parts.

A real multi-host run needs several processes; what IS testable here is
the contract every host must agree on: the per-process index math (strided,
disjoint, balanced, truncated to a common length), the guarded no-op
``initialize`` on a single process, and that ``global_batch`` on a
single-process mesh is exactly the plain batch sharding the rest of the
test suite already validates numerically.
"""

import numpy as np
import pytest

from ecg_denoise_tpu.parallel import make_mesh, multihost, shard_batch


def test_shard_indices_partition_is_exact():
    for n_total, P in [(100, 4), (101, 4), (8, 8), (9, 2), (10_000, 32)]:
        per_host = n_total // P
        all_idx = [
            multihost.process_shard_indices(n_total, p, P) for p in range(P)
        ]
        for idx in all_idx:
            assert len(idx) == per_host, "hosts must hold identical counts"
        flat = np.concatenate(all_idx)
        assert len(np.unique(flat)) == len(flat), "shards must be disjoint"
        assert flat.min() >= 0 and flat.max() < n_total
        # Strided pattern: host p owns p, p+P, p+2P, ...
        np.testing.assert_array_equal(
            all_idx[1], np.arange(1, 1 + per_host * P, P)
        )


def test_shard_indices_single_process_is_identity():
    idx = multihost.process_shard_indices(17, 0, 1)
    np.testing.assert_array_equal(idx, np.arange(17))


def test_shard_indices_rejects_bad_args():
    with pytest.raises(ValueError):
        multihost.process_shard_indices(10, 4, 4)  # p out of range
    with pytest.raises(ValueError):
        multihost.process_shard_indices(3, 0, 8)  # too few windows


def test_process_shard_slices_all_arrays_consistently():
    x = np.arange(20).reshape(10, 2)
    y = np.arange(10)
    xs, ys = multihost.process_shard(x, y, process_index=1, process_count=3)
    np.testing.assert_array_equal(ys, [1, 4, 7])
    np.testing.assert_array_equal(xs, x[[1, 4, 7]])


def test_initialize_is_noop_on_single_process(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert multihost.initialize() is False
    # Explicit single-process description: still a no-op.
    assert multihost.initialize("localhost:1234", num_processes=1) is False


def test_global_batch_single_process_matches_shard_batch():
    import jax.numpy as jnp

    mesh = make_mesh(n_data=4, n_model=2)
    x = np.random.default_rng(0).standard_normal((16, 2, 32)).astype(np.float32)
    a = multihost.global_batch(x, mesh)
    b = shard_batch(jnp.asarray(x), mesh)
    assert a.sharding == b.sharding
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
