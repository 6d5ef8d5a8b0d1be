"""Fused-layer kernel parity: apply_fast == RaleNet.apply(train=False).

Runs in Pallas interpret mode on CPU; on-hardware (Mosaic) coverage of the
same kernels lives in tests/test_tpu_kernels.py (TPU-gated).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ecg_denoise_tpu.kernels.block_pallas as bp
import ecg_denoise_tpu.kernels.attention_pallas as ap
from ecg_denoise_tpu.models import RaleNet
from ecg_denoise_tpu.models.ralenet_fast import apply_fast


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(bp, "_INTERPRET", True)
    monkeypatch.setattr(ap, "_INTERPRET", True)


def _init_variables(model, x, randomize_bias):
    variables = jax.jit(lambda k, s: model.init(k, s, train=False))(
        jax.random.PRNGKey(0), x
    )
    # Randomise the (zero-init) bias tables so the bias path is exercised.
    if randomize_bias:
        params = dict(variables["params"])
        for n in range(1, 5):
            t = params[f"rwattn{n}"]["relative_position_bias_table"]
            params[f"rwattn{n}"] = {
                "relative_position_bias_table": 0.02
                * jax.random.normal(jax.random.PRNGKey(n), t.shape)
            }
        variables = {**variables, "params": params}
    return variables


@pytest.mark.parametrize("variant", ["full", "mlp", "nra"])
def test_apply_fast_matches_reference_path(variant):
    model = RaleNet(variant=variant)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 256), jnp.float32)
    variables = _init_variables(model, x, variant in ("mlp", "full"))

    ref = model.apply(variables, x, train=False)
    fast = apply_fast(variables, x, variant=variant, mm_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_apply_fast_bf16_matmuls():
    """The serving/bench default (mm_dtype=bfloat16, f32 accumulation) stays
    close to the f32 reference path — the configuration the headline
    throughput number actually runs (ADVICE round-1: it was previously
    enabled by mutating a module global and never parity-tested)."""
    model = RaleNet(variant="full")
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 256), jnp.float32)
    variables = _init_variables(model, x, True)

    ref = np.asarray(model.apply(variables, x, train=False))
    fast = np.asarray(apply_fast(variables, x, variant="full"))
    # bf16 mantissa is 8 bits; activations are O(1) over a 20-block net.
    np.testing.assert_allclose(fast, ref, atol=5e-2, rtol=5e-2)
    assert float(np.mean((fast - ref) ** 2)) < 1e-4


def test_apply_fast_r_pos():
    model = RaleNet(variant="full")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 256), jnp.float32)
    variables = jax.jit(lambda k, s: model.init(k, s, train=False))(
        jax.random.PRNGKey(0), x
    )
    ref = model.apply(variables, x, train=False, r_pos=jnp.int32(100))
    fast = apply_fast(variables, x, variant="full", r_pos=jnp.int32(100),
                      mm_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def _small_layer_setup(local_enhence=True, has_bias=True, depth=2):
    """A BasicLayer at small dims + the fused-layer call ingredients."""
    from ecg_denoise_tpu.ops.attention import BasicLayer, sinusoidal_pe_table

    L, C, H = 32, 8, 2
    layer = BasicLayer(dim=C, depth=depth, num_heads=H,
                       local_enhence=local_enhence)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, L, C), jnp.float32)
    bias = (0.1 * jax.random.normal(jax.random.PRNGKey(2), (1, H, L, L))
            if has_bias else None)
    params = layer.init(jax.random.PRNGKey(0), x, bias)["params"]
    pe = sinusoidal_pe_table(1000, C)[0, :L, :]
    blocks = [params[f"blocks_{i}"] for i in range(depth)]
    b3 = None if bias is None else bias.reshape(H, L, L)
    return layer, params, blocks, x, pe, bias, b3, H


@pytest.mark.parametrize("strategy", ["fused", "residual"])
@pytest.mark.parametrize("local_enhence,has_bias", [
    (True, True), (False, True), (True, False),
])
def test_fused_layer_diff_matches_flax_grads(local_enhence, has_bias, strategy):
    """Value AND gradient parity of the differentiable fused layer
    (kernels/block_pallas.fused_layer_diff, in-kernel jax.vjp backward)
    against the flax BasicLayer under XLA autodiff — x, bias and every
    block weight get the same cotangents."""
    layer, params, blocks, x, pe, bias, b3, H = _small_layer_setup(
        local_enhence, has_bias
    )
    cot = jax.random.normal(jax.random.PRNGKey(3), x.shape, jnp.float32)

    def loss_ref(params, x, bias):
        y = layer.apply({"params": params}, x, bias)
        return jnp.sum(y * cot)

    def loss_pallas(params, x, b3):
        blocks = [params[f"blocks_{i}"] for i in range(2)]
        y = bp.fused_layer_diff(x, pe, b3, blocks, num_heads=H,
                                local_enhence=local_enhence,
                                mm_dtype=jnp.float32, backend="pallas",
                                strategy=strategy)
        return jnp.sum(y * cot)

    args_ref = (params, x, bias)
    args_pl = (params, x, b3)
    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(*args_ref)
    v_pl, g_pl = jax.value_and_grad(loss_pallas, argnums=(0, 1, 2))(*args_pl)

    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=2e-5)
    # params grads (tree), dx, dbias
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref[0])
    flat_pl = {jax.tree_util.keystr(k): v
               for k, v in jax.tree_util.tree_leaves_with_path(g_pl[0])}
    for k, ref_leaf in flat_ref:
        got = flat_pl[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref_leaf), atol=3e-4, rtol=2e-3,
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(k)}",
        )
    np.testing.assert_allclose(np.asarray(g_pl[1]), np.asarray(g_ref[1]),
                               atol=3e-4, rtol=2e-3, err_msg="dx")
    if has_bias:
        np.testing.assert_allclose(
            np.asarray(g_pl[2]).reshape(-1), np.asarray(g_ref[2]).reshape(-1),
            atol=3e-4, rtol=2e-3, err_msg="dbias",
        )


def test_layer_math_xla_fallback_matches_flax():
    """The per-stage XLA fallback (backend='xla') is the same math."""
    layer, params, blocks, x, pe, bias, b3, H = _small_layer_setup()
    ref = layer.apply({"params": params}, x, bias)
    got = bp.fused_layer_diff(x, pe, b3, blocks, num_heads=H,
                              local_enhence=True, mm_dtype=jnp.float32,
                              backend="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_apply_fast_train_matches_model_train_mode():
    """apply_fast_train == RaleNet.apply(train=True, mutable=batch_stats):
    outputs AND the updated BN running stats (value parity; gradient parity
    of the fused layers is covered per-stage above and on-chip in
    tests/test_tpu_kernels.py)."""
    from ecg_denoise_tpu.models.ralenet_fast import apply_fast_train

    model = RaleNet(variant="full")
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 256), jnp.float32)
    variables = _init_variables(model, x, True)

    ref, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
    got, new_stats = apply_fast_train(variables, x, variant="full",
                                      mm_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)
    for key in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(new_stats["conv1_bn"][key]),
            np.asarray(mut["batch_stats"]["conv1_bn"][key]),
            atol=1e-6, rtol=1e-5, err_msg=f"BN running {key}",
        )


def test_apply_fast_train_grads_match_model_xla_backend():
    """End-to-end gradient wiring of the fused training path (loss ->
    stem conv, BN, rel-pos tables, every stage, head) against the flax
    model. backend='xla' runs the same layer math without pallas_call —
    fast, and isolates the wiring from kernel numerics (which the per-stage
    pallas tests above cover)."""
    from ecg_denoise_tpu.models.ralenet_fast import apply_fast_train

    model = RaleNet(variant="full")
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 256), jnp.float32)
    variables = _init_variables(model, x, True)
    params, stats = variables["params"], variables["batch_stats"]
    target = jax.random.normal(jax.random.PRNGKey(7), x.shape, jnp.float32)

    def loss_ref(params):
        out, _ = model.apply({"params": params, "batch_stats": stats}, x,
                             train=True, mutable=["batch_stats"])
        return jnp.mean((out - target) ** 2)

    def loss_fast(params):
        out, _ = apply_fast_train({"params": params, "batch_stats": stats},
                                  x, variant="full", mm_dtype=jnp.float32,
                                  backend="xla")
        return jnp.mean((out - target) ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_fast = jax.grad(loss_fast)(params)
    ref_leaves = {jax.tree_util.keystr(k): v for k, v in
                  jax.tree_util.tree_leaves_with_path(g_ref)}
    for k, got in jax.tree_util.tree_leaves_with_path(g_fast):
        name = jax.tree_util.keystr(k)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(ref_leaves[name]),
                                   atol=5e-4, rtol=5e-3, err_msg=name)


def test_block_group_size_counts_full_working_set():
    """The VMEM budget must count the block kernel's whole padded working
    set (qkv + logits + MLP slabs), not just the attention (G*H, L, L) set
    (ADVICE round-1). Sanity: stays within budget and >= 1."""
    for (H, L, C) in ((2, 256, 8), (4, 128, 16), (32, 16, 128)):
        g = bp.block_group_size(512, H, L, C, 4 * C)
        assert g >= 1 and 512 % g == 0
        assert g * 4 * bp._block_unit_elems(H, L, C, 4 * C) <= bp._BUDGET_BYTES
