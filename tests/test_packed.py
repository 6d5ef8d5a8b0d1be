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


# --- fast unit tests for the packed-layout primitives (no model) -------------


def _pack_windows(x, P):  # (B, L, C) -> (B/P, L, P*C), canonical order
    B, L, C = x.shape
    return (x.reshape(B // P, P, L, C).transpose(0, 2, 1, 3)
            .reshape(B // P, L, P * C))


def _unpack_windows(z, P, C):  # inverse of _pack_windows
    R, L, PC = z.shape
    return (z.reshape(R, L, P, C).transpose(0, 2, 1, 3)
            .reshape(R * P, L, C))


def test_pmat_bitwise_equals_per_window_dense():
    from ecg_denoise_tpu.models.ralenet_packed import _pmat

    rng = np.random.default_rng(0)
    B, L, C, Cout, P = 8, 4, 8, 32, 16
    x = jnp.asarray(rng.standard_normal((B * P, L, C)), jnp.float32)
    W = jnp.asarray(rng.standard_normal((C, Cout)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((Cout,)), jnp.float32)
    ref = jnp.dot(x, W, precision=jax.lax.Precision.HIGHEST) + b
    zp = _pmat(_pack_windows(x, P), W, b, P, jnp.float32)
    got = _unpack_windows(zp, P, Cout)
    # Exact math up to summation-order rounding: the off-block zeros
    # cannot perturb any partial sum, but a K=128 contraction pairs the
    # 8 real terms in a different reduction tree than K=8 (measured ~2
    # ulp f32 drift on CPU), so the gate is ulp-scale, not bitwise.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-6)


def test_pln_matches_layernorm():
    from ecg_denoise_tpu.models.ralenet_packed import _pln
    from ecg_denoise_tpu.ops.layers import LayerNorm

    rng = np.random.default_rng(1)
    B, L, C, P = 16, 8, 16, 8
    x = jnp.asarray(rng.standard_normal((B, L, C)) * 3 + 1, jnp.float32)
    scale = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
    ref = LayerNorm().apply(
        {"params": {"scale": scale, "bias": bias}}, x)
    zp = _pln(_pack_windows(x, P), {"scale": scale, "bias": bias}, P, C,
              jnp.float32)
    got = _unpack_windows(zp, P, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pmerge_psep_match_reference_formulations():
    """Packed PatchMerging/PatchSeparate == the per-window formulations
    (even/odd interleave + channel concat; channel halves -> length),
    including the batch-row exchange's canonical window order."""
    from ecg_denoise_tpu.models.ralenet_packed import _pmerge, _psep

    rng = np.random.default_rng(2)
    B, L, C, P = 16, 8, 16, 8

    def ln_id_params(c):
        return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}

    x = jnp.asarray(rng.standard_normal((B, L, C)), jnp.float32)

    # merge reference (ops/attention.py PatchMerging semantics, identity
    # LN scale/bias and identity reduction to isolate the layout math):
    Wm = jnp.eye(2 * C, dtype=jnp.float32)
    pm = {"norm": ln_id_params(2 * C), "reduction": {"kernel": Wm}}
    cat = jnp.concatenate([x[:, 0::2, :], x[:, 1::2, :]], axis=-1)
    mf = cat.astype(jnp.float32)
    mean = jnp.mean(mf, axis=-1, keepdims=True)
    var = jnp.mean((mf - mean) ** 2, axis=-1, keepdims=True)
    ref_merge = (mf - mean) * jax.lax.rsqrt(var + 1e-5)
    got = _pmerge(_pack_windows(x, P), pm, P, C, jnp.float32)
    got_merge = _unpack_windows(got, P // 2, 2 * C)
    np.testing.assert_allclose(np.asarray(got_merge), np.asarray(ref_merge),
                               atol=1e-5, rtol=1e-5)

    # separate reference (channel-half CONCATENATION along length):
    half = C // 2
    Ws = jnp.eye(half, dtype=jnp.float32)
    ps = {"norm": ln_id_params(half), "reduction": {"kernel": Ws}}
    sep = jnp.concatenate([x[:, :, :half], x[:, :, half:]], axis=1)
    sf = sep.astype(jnp.float32)
    mean = jnp.mean(sf, axis=-1, keepdims=True)
    var = jnp.mean((sf - mean) ** 2, axis=-1, keepdims=True)
    ref_sep = (sf - mean) * jax.lax.rsqrt(var + 1e-5)
    got = _psep(_pack_windows(x, P), ps, P, C, jnp.float32)
    got_sep = _unpack_windows(got, 2 * P, half)
    np.testing.assert_allclose(np.asarray(got_sep), np.asarray(ref_sep),
                               atol=1e-5, rtol=1e-5)


def test_pleff_matches_partial_conv():
    """Packed LeFF conv == PartialConv1d with n_div == dim (one channel
    convolved, cross-correlation k=3 pad=1, no bias)."""
    from ecg_denoise_tpu.models.ralenet_packed import _pleff

    rng = np.random.default_rng(3)
    B, L, hidden, P = 8, 16, 8, 4
    x = jnp.asarray(rng.standard_normal((B, L, hidden)), jnp.float32)
    taps = jnp.asarray(rng.standard_normal((3, 1, 1)), jnp.float32)
    # reference: convolve channel 0 over length, pass the rest through.
    xc = x.transpose(0, 2, 1)  # (B, hidden, L)
    x0 = jax.lax.conv_general_dilated(
        xc[:, :1, :], taps, (1,), [(1, 1)],
        dimension_numbers=("NCH", "HIO", "NCH"))
    ref = jnp.concatenate([x0, xc[:, 1:, :]], axis=1).transpose(0, 2, 1)
    got = _unpack_windows(
        _pleff(_pack_windows(x, P), taps, P, hidden), P, hidden)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)
