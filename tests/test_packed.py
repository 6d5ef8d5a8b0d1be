"""Parity tests: the window-packed forward vs the standard RaleNet apply.

The packed forward (models/ralenet_packed.py) re-expresses every op in the
(B/P, L, P*C) lane-packed layout; its Dense matmuls are bitwise-identical
block-diagonal forms, the LayerNorm/merge/separate re-formulations differ
only in floating-point summation order, and the attention runs through the
same fused Pallas kernels the standard use_pallas path uses (interpreted
here on CPU). So f32 parity holds at ~1e-4 model scale, like apply_fast.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ecg_denoise_tpu.kernels.attention_pallas as ap
from ecg_denoise_tpu.models import RaleNet
from ecg_denoise_tpu.models.ralenet_packed import apply_packed


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(ap, "_INTERPRET", True)


def _init(variant, key=0, B=16):
    model = RaleNet(variant=variant)
    x = jnp.asarray(
        np.random.default_rng(key).standard_normal((B, 2, 256)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(key), x[:2], train=False)
    # Zero-init bias tables make the rpos path trivially bias-free; give
    # them real values so parity exercises the bias math.
    params = jax.tree_util.tree_map(lambda a: a, variables["params"])
    for name in list(params):
        if name.startswith("rwattn"):
            t = params[name]["relative_position_bias_table"]
            params[name]["relative_position_bias_table"] = (
                jax.random.normal(jax.random.PRNGKey(sum(map(ord, name))),
                                  t.shape, t.dtype) * 0.3)
    variables = {**variables, "params": params}
    return model, variables, x


@pytest.mark.parametrize("variant", ["full", "mlp", "nra"])
def test_packed_forward_parity_f32(variant):
    model, variables, x = _init(variant)
    ref = model.apply(variables, x, train=False)
    out = apply_packed(variables, x, variant=variant, mm_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


def test_packed_forward_parity_rpos():
    model, variables, x = _init("full", key=3)
    r_pos = jnp.asarray(
        np.random.default_rng(5).integers(0, 256, size=(x.shape[0],)))
    ref = model.apply(variables, x, train=False, r_pos=r_pos)
    out = apply_packed(variables, x, variant="full", r_pos=r_pos,
                       mm_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


def test_packed_forward_bf16_close():
    """bf16 packed vs bf16 XLA model: same loose tolerance scale as the
    apply_fast bf16 check (bf16 rounding noise, not formulation error)."""
    model, variables, x = _init("full", key=7)
    bf = RaleNet(variant="full", dtype=jnp.bfloat16)
    ref = bf.apply(variables, x, train=False).astype(jnp.float32)
    out = apply_packed(variables, x, variant="full",
                       mm_dtype=jnp.bfloat16).astype(jnp.float32)
    scale = float(jnp.std(ref)) + 1e-6
    err = float(jnp.max(jnp.abs(out - ref))) / scale
    assert err < 0.35, f"bf16 packed deviates {err:.3f} sigma from bf16 XLA"


def test_packed_train_parity_f32():
    """apply_packed_train == RaleNet.apply(train=True, mutable): outputs
    AND the stem BatchNorm running-stat updates."""
    from ecg_denoise_tpu.models.ralenet_packed import apply_packed_train

    model, variables, x = _init("full", key=11)
    ref, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
    out, new_stats = apply_packed_train(variables, x, variant="full",
                                        mm_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(new_stats["conv1_bn"][k]),
            np.asarray(mut["batch_stats"]["conv1_bn"][k]), atol=1e-5)


def test_packed_is_jittable_and_differentiable():
    model, variables, x = _init("full", key=9)

    @jax.jit
    def loss(v, xx):
        return jnp.mean(apply_packed(v, xx, mm_dtype=jnp.float32) ** 2)

    g = jax.grad(loss)(variables, x)
    leaves = jax.tree_util.tree_leaves(g["params"])
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


def test_packed_dp_step_matches_single_device():
    """The shard_map data-parallel packed trainer (sync-BN + pmean'd
    grads) reproduces the single-device packed step: same contract
    tests/test_mesh.py pins for the XLA DP/TP path. SGD keeps the updated
    params linear in the gradients, so param equality certifies the
    sharded gradients themselves."""
    import optax

    from ecg_denoise_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
    from ecg_denoise_tpu.train.state import create_train_state
    from ecg_denoise_tpu.train.steps import make_epoch_fns

    model, variables, x = _init("full", key=17, B=32)
    clean = x * 0.5
    tx = optax.sgd(0.1)
    state, _ = create_train_state(model, jax.random.PRNGKey(0), x[:2],
                                  optimizer=tx, variables=variables)
    train_epoch, eval_epoch = make_epoch_fns(
        model, tx, donate=False, packed_variant="full")
    ref_state, ref_m = train_epoch(state, x, clean, jax.random.PRNGKey(1), 32)
    ref_ev = eval_epoch(ref_state, x, clean, 32)

    mesh = make_mesh(n_data=2, n_model=1)  # 16 windows per shard (>= P0)
    train_dp, eval_dp = make_epoch_fns(
        model, tx, donate=False, packed_variant="full", packed_mesh=mesh)
    with mesh:
        sh_state = replicate_state(state, mesh)
        nb, cb = shard_batch(x, mesh), shard_batch(clean, mesh)
        dp_state, dp_m = train_dp(sh_state, nb, cb, jax.random.PRNGKey(1), 32)
        dp_ev = eval_dp(dp_state, nb, cb, 32)
    assert float(dp_m["loss"]) == pytest.approx(float(ref_m["loss"]), rel=1e-5)
    for r, d in zip(jax.tree_util.tree_leaves(ref_state.params),
                    jax.tree_util.tree_leaves(dp_state.params)):
        np.testing.assert_allclose(np.asarray(r), np.asarray(d), atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(ref_state.batch_stats["conv1_bn"][k]),
            np.asarray(dp_state.batch_stats["conv1_bn"][k]), atol=1e-6)
    assert float(dp_ev["snr"]) == pytest.approx(float(ref_ev["snr"]), rel=1e-4)


def test_packed_train_epoch_with_detected_rpos():
    """make_epoch_fns(packed_variant=...) composes with detect_r_pos (the
    fused rpos kernel takes per-window offsets natively) and takes a
    finite optimization step."""
    import optax

    from ecg_denoise_tpu.train.state import create_train_state
    from ecg_denoise_tpu.train.steps import make_epoch_fns

    model, variables, x = _init("full", key=13, B=32)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), x[:2],
                                   variables=variables)
    train_epoch, eval_epoch = make_epoch_fns(
        model, tx, donate=False, detect_r_pos=True, packed_variant="full")
    clean = x * 0.5
    state2, m = train_epoch(state, x, clean, jax.random.PRNGKey(1), 16)
    assert np.isfinite(float(m["loss"]))
    assert int(state2.step) == 2
    ev = eval_epoch(state2, x, clean, 16)
    assert np.isfinite(float(ev["snr"]))


def test_packed_newrale_parity_f32():
    """12-lead NewRale with the packed core == the standard NewRale apply."""
    from ecg_denoise_tpu.models import NewRale
    from ecg_denoise_tpu.models.ralenet_packed import apply_packed_newrale

    model = NewRale(variant="full")
    x = jnp.asarray(
        np.random.default_rng(21).standard_normal((16, 12, 256)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(3), x[:2], train=False)
    ref = model.apply(variables, x, train=False)
    out = apply_packed_newrale(variables, x, variant="full",
                               mm_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)
