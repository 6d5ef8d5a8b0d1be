"""Mesh/sharding tests on the 8-device virtual CPU mesh (conftest forces
--xla_force_host_platform_device_count=8): mesh construction, batch
sharding, TP param specs, and a full DP+TP-sharded training step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from ecg_denoise_tpu.models import build_model
from ecg_denoise_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate_state,
    shard_state_dp_tp,
)
from ecg_denoise_tpu.train.state import create_train_state
from ecg_denoise_tpu.train.steps import make_epoch_fns

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def test_make_mesh_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh_dp = make_mesh()  # all devices on data
    assert mesh_dp.shape["data"] == jax.device_count()


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh(n_data=8, n_model=1)
    x = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4)
    xs = shard_batch(x, mesh)
    assert xs.sharding.spec == P("data")
    # Each device holds 2 rows.
    assert len(xs.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


def test_tp_shards_transformer_projections():
    mesh = make_mesh(n_data=4, n_model=2)
    model = build_model("ralenet_nra")
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((2, 2, 256), jnp.float32)
    )
    state = shard_state_dp_tp(state, mesh)
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    tp_sharded = replicated = 0
    for path, leaf in flat:
        names = [getattr(p, "key", "") for p in path]
        spec = leaf.sharding.spec
        if "to_q" in names and names[-1] == "kernel":
            assert spec == P(None, "model"), names
            tp_sharded += 1
        elif "proj" in names and names[-1] == "kernel":
            assert spec == P("model", None), names
            tp_sharded += 1
        elif spec == P():
            replicated += 1
    # 9 BasicLayers (4 enc + bottleneck + 4 dec) x 2 blocks x (to_q + proj).
    assert tp_sharded == 36
    assert replicated > 0  # conv stems etc. stay replicated


def test_sharded_train_step_executes():
    mesh = make_mesh(n_data=4, n_model=2)
    model = build_model("unet")
    rng = np.random.default_rng(0)
    noisy = rng.standard_normal((16, 2, 256)).astype(np.float32)
    clean = (noisy * 0.5).astype(np.float32)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), jnp.asarray(noisy[:2]))
    with mesh:
        state = replicate_state(state, mesh)
        nb = shard_batch(jnp.asarray(noisy), mesh)
        cb = shard_batch(jnp.asarray(clean), mesh)
        train_epoch, eval_epoch = make_epoch_fns(model, tx, donate=False)
        state, m = train_epoch(state, nb, cb, jax.random.PRNGKey(1), 8)
        ev = eval_epoch(state, nb, cb, 8)
    assert np.isfinite(float(m["loss"])) and np.isfinite(float(ev["snr"]))


def test_dp_matches_single_device():
    """The SPMD-sharded epoch computes the same update as unsharded."""
    model = build_model("unet")
    rng = np.random.default_rng(1)
    noisy = rng.standard_normal((16, 2, 256)).astype(np.float32)
    clean = (noisy * 0.5).astype(np.float32)

    def run(mesh):
        state, tx = create_train_state(
            model, jax.random.PRNGKey(0), jnp.asarray(noisy[:2])
        )
        train_epoch, _ = make_epoch_fns(model, tx, donate=False)
        nb, cb = jnp.asarray(noisy), jnp.asarray(clean)
        if mesh is not None:
            with mesh:
                state = replicate_state(state, mesh)
                nb, cb = shard_batch(nb, mesh), shard_batch(cb, mesh)
                state, m = train_epoch(state, nb, cb, jax.random.PRNGKey(1), 16)
        else:
            state, m = train_epoch(state, nb, cb, jax.random.PRNGKey(1), 16)
        return float(m["loss"]), jax.tree.leaves(state.params)[0]

    loss_1, leaf_1 = run(None)
    loss_8, leaf_8 = run(make_mesh(n_data=8, n_model=1))
    assert loss_1 == pytest.approx(loss_8, rel=1e-5)
    np.testing.assert_allclose(np.asarray(leaf_1), np.asarray(leaf_8), atol=1e-5)
