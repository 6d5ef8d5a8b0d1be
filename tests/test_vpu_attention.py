"""Parity tests: VPU attention engine vs the XLA reference path.

Interpreter mode on CPU (pallas_guide.md: interpret=True); on TPU the same
kernel compiles via Mosaic. Both paths accumulate in f32.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ecg_denoise_tpu.kernels.attention_vpu as av
from ecg_denoise_tpu.ops.attention import multi_head_attention


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(av, "_INTERPRET", True)


def _rand(shape, key):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


# All four small-L model stages (H*L = 512) plus an unpacked-P corner.
STAGES = [(64, 8), (32, 16), (16, 32), (128, 4), (64, 4)]


@pytest.mark.parametrize("L,H", STAGES)
@pytest.mark.parametrize("with_bias", [True, False])
def test_vpu_attention_forward_parity(L, H, with_bias):
    B, D = 6, 4
    q, k, v = (_rand((B, H, L, D), i) for i in range(3))
    bias = _rand((1, H, L, L), 7) if with_bias else None
    ref = multi_head_attention(q, k, v, bias)
    out = av.vpu_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_vpu_attention_bf16_forward():
    B, H, L, D = 4, 32, 16, 4
    q, k, v = (_rand((B, H, L, D), i).astype(jnp.bfloat16) for i in range(3))
    bias = _rand((1, H, L, L), 7).astype(jnp.bfloat16)
    ref = multi_head_attention(q, k, v, bias)
    out = av.vpu_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)


@pytest.mark.parametrize("with_bias", [True, False])
@pytest.mark.parametrize("L,H", [(64, 8), (16, 32), (32, 4)])
def test_vpu_attention_grad_parity(with_bias, L, H):
    B, D = 3, 4
    q, k, v = (_rand((B, H, L, D), i) for i in range(3))
    bias = _rand((1, H, L, L), 7) if with_bias else None

    def loss_ref(q, k, v, bias):
        return jnp.sum(multi_head_attention(q, k, v, bias) ** 2)

    def loss_vpu(q, k, v, bias):
        return jnp.sum(av.vpu_attention(q, k, v, bias) ** 2)

    argnums = (0, 1, 2, 3) if with_bias else (0, 1, 2)
    g_ref = jax.grad(loss_ref, argnums)(q, k, v, bias)
    g_vpu = jax.grad(loss_vpu, argnums)(q, k, v, bias)
    for a, b in zip(g_vpu, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_dispatcher_routes_small_l_to_vpu(monkeypatch):
    """With ECG_ATTN_ENGINE=auto, multi_head_attention must route small-L
    shapes through the VPU engine (observed via a counting wrapper)."""
    monkeypatch.setenv("ECG_ATTN_ENGINE", "auto")
    calls = []
    real = av.vpu_attention

    def spy(q, k, v, bias=None):
        calls.append(q.shape)
        return real(q, k, v, bias)

    import ecg_denoise_tpu.kernels.attention_vpu as mod

    monkeypatch.setattr(mod, "vpu_attention", spy)
    B, H, L, D = 2, 16, 32, 4
    q, k, v = (_rand((B, H, L, D), i) for i in range(3))
    out = multi_head_attention(q, k, v, None, use_pallas=True)
    ref = multi_head_attention(q, k, v, None)
    assert calls == [(B, H, L, D)]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # And L=256 stays on the MXU kernel even in auto.
    calls.clear()
    monkeypatch.setattr(
        "ecg_denoise_tpu.kernels.attention_pallas._INTERPRET", True)
    q2, k2, v2 = (_rand((2, 2, 256, 4), i) for i in range(3))
    multi_head_attention(q2, k2, v2, None, use_pallas=True)
    assert calls == []


def _toep(L, W, H, key=11):
    table = _rand((2 * W - 1, H), key)
    pos = jnp.arange(L)
    rel = pos[:, None] - pos[None, :]
    idx = jnp.clip(rel + W - 1, 0, 2 * W - 2)
    return (table[idx] * (jnp.abs(rel) < W)[..., None]).transpose(2, 0, 1)[None]


@pytest.mark.parametrize("L,W,H", [(64, 8, 8), (32, 4, 16), (16, 4, 32)])
def test_vpu_rpos_forward_parity(L, W, H):
    """Per-window R-peak VPU kernel vs the materialized XLA bias, incl.
    edge-truncating offsets (windows hanging off both ends)."""
    from ecg_denoise_tpu.ops.attention import RPosBias

    B, D = 4, 4
    q, k, v = (_rand((B, H, L, D), i) for i in range(3))
    toep = _toep(L, W, H)
    r_pos = jnp.asarray([0, 5, L // 2, L - 1], jnp.int32)
    offsets = (r_pos - W // 2).astype(jnp.float32)
    bias = RPosBias(toep=toep, offsets=offsets, W=W).materialize()
    ref = multi_head_attention(q, k, v, bias)
    out = av.vpu_attention_rpos(q, k, v, toep, W, offsets)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_vpu_rpos_grad_parity():
    from ecg_denoise_tpu.ops.attention import RPosBias

    B, H, L, D, W = 4, 16, 32, 4, 4
    q, k, v = (_rand((B, H, L, D), i) for i in range(3))
    toep = _toep(L, W, H)
    offsets = (jnp.asarray([3, 10, 16, 30], jnp.int32) - W // 2).astype(
        jnp.float32)

    def loss_ref(q, k, v, toep):
        bias = RPosBias(toep=toep, offsets=offsets, W=W).materialize()
        return jnp.sum(multi_head_attention(q, k, v, bias) ** 2)

    def loss_vpu(q, k, v, toep):
        return jnp.sum(av.vpu_attention_rpos(q, k, v, toep, W, offsets) ** 2)

    g_ref = jax.grad(loss_ref, (0, 1, 2, 3))(q, k, v, toep)
    g_vpu = jax.grad(loss_vpu, (0, 1, 2, 3))(q, k, v, toep)
    for a, b in zip(g_vpu, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_vpu_pack_factor():
    assert av.vpu_pack_factor(32, 16) == 8
    assert av.vpu_pack_factor(16, 32) == 4
    assert av.vpu_pack_factor(8, 64) == 2
    assert av.vpu_pack_factor(4, 128) == 1
    assert av.vpu_pack_factor(2, 256) == 1
    assert av.vpu_pack_factor(4, 64) == 2  # capped by H divisibility
