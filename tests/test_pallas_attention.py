"""Parity tests: Pallas fused attention vs the XLA reference path.

Runs the kernel in interpreter mode on CPU (pallas_guide.md: interpret=True)
so parity is validated without TPU hardware; on TPU the same kernel
compiles via Mosaic. Tolerance 1e-5 f32 (both paths accumulate in f32).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ecg_denoise_tpu.kernels.attention_pallas as ap
from ecg_denoise_tpu.ops.attention import multi_head_attention


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(ap, "_INTERPRET", True)


def _rand(shape, key):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize("L,H", [(256, 2), (32, 8), (16, 32)])
@pytest.mark.parametrize("with_bias", [True, False])
def test_fused_attention_forward_parity(L, H, with_bias):
    B, D = 3, 4
    q, k, v = (_rand((B, H, L, D), i) for i in range(3))
    bias = _rand((1, H, L, L), 7) if with_bias else None
    ref = multi_head_attention(q, k, v, bias)
    out = ap.fused_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("with_bias", [True, False])
@pytest.mark.parametrize("L,H", [(64, 4), (16, 32), (256, 2)])
def test_fused_attention_grad_parity(with_bias, L, H):
    # L=64/H=4 packs P=2, L=16/H=32 packs P=8 (exercises the block-diag
    # dbias extraction), L=256 takes the unpacked path.
    B, D = 2, 4
    q, k, v = (_rand((B, H, L, D), i) for i in range(3))
    bias = _rand((1, H, L, L), 7) if with_bias else None

    def loss_ref(q, k, v, bias):
        return jnp.sum(multi_head_attention(q, k, v, bias) ** 2)

    def loss_pal(q, k, v, bias):
        return jnp.sum(ap.fused_attention(q, k, v, bias) ** 2)

    argnums = (0, 1, 2, 3) if with_bias else (0, 1, 2)
    g_ref = jax.grad(loss_ref, argnums)(q, k, v, bias)
    g_pal = jax.grad(loss_pal, argnums)(q, k, v, bias)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
