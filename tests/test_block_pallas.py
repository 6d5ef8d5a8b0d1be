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


def test_block_group_size_counts_full_working_set():
    """The VMEM budget must count the block kernel's whole padded working
    set (qkv + logits + MLP slabs), not just the attention (G*H, L, L) set
    (ADVICE round-1). Sanity: stays within budget and >= 1."""
    for (H, L, C) in ((2, 256, 8), (4, 128, 16), (32, 16, 128)):
        g = bp.block_group_size(512, H, L, C, 4 * C)
        assert g >= 1 and 512 % g == 0
        assert g * 4 * bp._block_unit_elems(H, L, C, 4 * C) <= bp._BUDGET_BYTES
