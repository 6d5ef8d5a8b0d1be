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


def _toep(L, W, H, key=11):
    """Random Toeplitz bias from a (2W-1, H) table, zero for |l-m|>=W."""
    table = _rand((2 * W - 1, H), key)
    pos = jnp.arange(L)
    rel = pos[:, None] - pos[None, :]
    idx = jnp.clip(rel + W - 1, 0, 2 * W - 2)
    return (table[idx] * (jnp.abs(rel) < W)[..., None]).transpose(2, 0, 1)[None]


def _materialize_rpos(toep, offsets, W):
    from ecg_denoise_tpu.ops.attention import RPosBias

    return RPosBias(toep=toep, offsets=offsets, W=W).materialize()


# Model stage shapes: (L, W, H) for encoder stages 1..4 (decoder mirrors).
@pytest.mark.parametrize("L,W,H", [(256, 32, 2), (64, 8, 8), (32, 4, 16)])
def test_fused_attention_rpos_forward_parity(L, W, H):
    """Per-window R-peak kernel vs the materialized XLA bias, including
    edge-truncating offsets (windows hanging off both ends)."""
    B, D = 4, 4
    q, k, v = (_rand((B, H, L, D), i) for i in range(3))
    toep = _toep(L, W, H)
    r_pos = jnp.asarray([0, 5, L // 2, L - 1], jnp.int32)
    offsets = (r_pos - W // 2).astype(jnp.float32)
    bias = _materialize_rpos(toep, offsets, W)
    ref = multi_head_attention(q, k, v, bias)
    out = ap.fused_attention_rpos(q, k, v, toep, W, offsets)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_attention_rpos_grad_parity():
    B, H, L, D, W = 4, 16, 32, 4, 4
    q, k, v = (_rand((B, H, L, D), i) for i in range(3))
    toep = _toep(L, W, H)
    offsets = (jnp.asarray([3, 10, 16, 30], jnp.int32) - W // 2).astype(
        jnp.float32)

    def loss_ref(q, k, v, toep):
        bias = _materialize_rpos(toep, offsets, W)
        return jnp.sum(multi_head_attention(q, k, v, bias) ** 2)

    def loss_pal(q, k, v, toep):
        return jnp.sum(ap.fused_attention_rpos(q, k, v, toep, W, offsets) ** 2)

    g_ref = jax.grad(loss_ref, (0, 1, 2, 3))(q, k, v, toep)
    g_pal = jax.grad(loss_pal, (0, 1, 2, 3))(q, k, v, toep)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_rpos_descriptor_matches_scalar_embed():
    """RPosBias.materialize() must equal the scalar embed() path run per
    window (the round-2 vmapped formulation), including edge truncation."""
    from ecg_denoise_tpu.ops.attention import RelativePositionEmbedding

    W, L, H = 8, 64, 2
    mod = RelativePositionEmbedding(length=W, whole_length=L, num_heads=H)
    table = _rand((2 * W - 1, H), 3)
    variables = {"params": {"relative_position_bias_table": table}}
    r_pos = jnp.asarray([0, 3, 32, 60, 63], jnp.int32)
    desc = mod.apply(variables, r_pos)
    got = desc.materialize()
    for i, rp in enumerate(np.asarray(r_pos)):
        want = mod.apply(variables, jnp.int32(rp))  # scalar path (1,H,L,L)
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(want[0]),
                                   atol=1e-6, err_msg=f"r_pos={rp}")


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


def test_ralenet_per_window_rpos_pallas_vs_xla():
    """Full RaleNet forward with PER-WINDOW r_pos: the use_pallas model
    (fused rpos kernel, interpret mode) must match the XLA model."""
    from ecg_denoise_tpu.models import RaleNet

    x = _rand((4, 2, 256), 0)
    r_pos = jnp.asarray([10, 100, 180, 250], jnp.int32)
    m_x = RaleNet(variant="full")
    variables = jax.jit(lambda: m_x.init(jax.random.PRNGKey(0), x, train=False))()
    # Non-zero bias tables so the rpos path actually matters.
    variables = jax.tree.map(
        lambda a: a + 0.05 if a.ndim == 2 and a.shape[-1] in (2, 4, 8, 16)
        else a, variables)
    ref = m_x.apply(variables, x, train=False, r_pos=r_pos)
    m_p = RaleNet(variant="full", use_pallas=True)
    out = m_p.apply(variables, x, train=False, r_pos=r_pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("L,H", [(256, 2), (32, 8), (16, 32)])
@pytest.mark.parametrize("with_bias", [True, False])
def test_fused_attention_blc_parity(L, H, with_bias):
    """Stream-layout interface vs the XLA path (fwd + grads): same math,
    no (B, H, L, D) intermediates."""
    B, D = 3, 4
    q2, k2, v2 = (_rand((B, L, H * D), i) for i in range(3))
    bias = _rand((1, H, L, L), 7) if with_bias else None

    def split(a2):
        return a2.reshape(B, L, H, D).transpose(0, 2, 1, 3)

    def loss_ref(q2, k2, v2, bias):
        out = multi_head_attention(split(q2), split(k2), split(v2), bias)
        return jnp.sum(out.transpose(0, 2, 1, 3).reshape(B, L, H * D) ** 2)

    def loss_blc(q2, k2, v2, bias):
        return jnp.sum(ap.fused_attention_blc(q2, k2, v2, bias, H) ** 2)

    argnums = (0, 1, 2, 3) if with_bias else (0, 1, 2)
    np.testing.assert_allclose(
        np.asarray(ap.fused_attention_blc(q2, k2, v2, bias, H)),
        np.asarray(multi_head_attention(split(q2), split(k2), split(v2), bias)
                   .transpose(0, 2, 1, 3).reshape(B, L, H * D)),
        atol=1e-5)
    g_ref = jax.grad(loss_ref, argnums)(q2, k2, v2, bias)
    g_blc = jax.grad(loss_blc, argnums)(q2, k2, v2, bias)
    for a, b in zip(g_blc, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_ralenet_blc_matches_xla(monkeypatch):
    """Full RaleNet forward with ECG_ATTN_GLUE=blc vs the XLA model."""
    monkeypatch.setenv("ECG_ATTN_GLUE", "blc")
    from ecg_denoise_tpu.models import RaleNet

    x = _rand((4, 2, 256), 0)
    m_x = RaleNet(variant="full")
    variables = jax.jit(lambda: m_x.init(jax.random.PRNGKey(0), x,
                                         train=False))()
    variables = jax.tree.map(
        lambda a: a + 0.05 if a.ndim == 2 and a.shape[-1] in (2, 4, 8, 16)
        else a, variables)
    ref = m_x.apply(variables, x, train=False)
    m_p = RaleNet(variant="full", use_pallas=True)
    out = m_p.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_fused_attention_rpos_blc_parity():
    """Stream-layout rpos interface vs the materialized XLA bias (fwd +
    grads), including edge-truncating offsets."""
    B, H, L, D, W = 4, 16, 32, 4, 4
    q2, k2, v2 = (_rand((B, L, H * D), i) for i in range(3))
    toep = _toep(L, W, H)
    offsets = (jnp.asarray([0, 10, 16, 31], jnp.int32) - W // 2).astype(
        jnp.float32)

    def split(a2):
        return a2.reshape(B, L, H, D).transpose(0, 2, 1, 3)

    def loss_ref(q2, k2, v2, toep):
        bias = _materialize_rpos(toep, offsets, W)
        out = multi_head_attention(split(q2), split(k2), split(v2), bias)
        return jnp.sum(out.transpose(0, 2, 1, 3).reshape(B, L, H * D) ** 2)

    def loss_blc(q2, k2, v2, toep):
        return jnp.sum(ap.fused_attention_rpos_blc(
            q2, k2, v2, toep, W, offsets, H) ** 2)

    np.testing.assert_allclose(
        np.asarray(ap.fused_attention_rpos_blc(q2, k2, v2, toep, W,
                                               offsets, H)),
        np.asarray(multi_head_attention(
            split(q2), split(k2), split(v2),
            _materialize_rpos(toep, offsets, W))
            .transpose(0, 2, 1, 3).reshape(B, L, H * D)),
        atol=1e-5)
    g_ref = jax.grad(loss_ref, (0, 1, 2, 3))(q2, k2, v2, toep)
    g_blc = jax.grad(loss_blc, (0, 1, 2, 3))(q2, k2, v2, toep)
    for a, b in zip(g_blc, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_ralenet_rpos_blc_matches_xla(monkeypatch):
    """Full RaleNet with per-window r_pos under ECG_ATTN_GLUE=blc."""
    monkeypatch.setenv("ECG_ATTN_GLUE", "blc")
    from ecg_denoise_tpu.models import RaleNet

    x = _rand((4, 2, 256), 0)
    r_pos = jnp.asarray([10, 100, 180, 250], jnp.int32)
    m_x = RaleNet(variant="full")
    variables = jax.jit(lambda: m_x.init(jax.random.PRNGKey(0), x,
                                         train=False))()
    variables = jax.tree.map(
        lambda a: a + 0.05 if a.ndim == 2 and a.shape[-1] in (2, 4, 8, 16)
        else a, variables)
    ref = m_x.apply(variables, x, train=False, r_pos=r_pos)
    m_p = RaleNet(variant="full", use_pallas=True)
    out = m_p.apply(variables, x, train=False, r_pos=r_pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("L,H", [(64, 8), (32, 16), (16, 32), (64, 4)])
@pytest.mark.parametrize("with_bias", [True, False])
def test_fused_attention_dense_forward_parity(L, H, with_bias, monkeypatch):
    """Dense K-packed forward (ECG_ATTN_DENSE=1) vs the XLA path."""
    monkeypatch.setenv("ECG_ATTN_DENSE", "1")
    B, D = 5, 4
    q, k, v = (_rand((B, H, L, D), i) for i in range(3))
    bias = _rand((1, H, L, L), 7) if with_bias else None
    ref = multi_head_attention(q, k, v, bias)
    out = ap.fused_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_attention_dense_grad_matches(monkeypatch):
    """Grads through the dense forward (bwd kernel unchanged) still match
    the XLA path — custom-VJP correctness is fwd-independent."""
    monkeypatch.setenv("ECG_ATTN_DENSE", "1")
    B, H, L, D = 2, 16, 32, 4
    q, k, v = (_rand((B, H, L, D), i) for i in range(3))
    bias = _rand((1, H, L, L), 7)

    def loss_ref(q, k, v, bias):
        return jnp.sum(multi_head_attention(q, k, v, bias) ** 2)

    def loss_pal(q, k, v, bias):
        return jnp.sum(ap.fused_attention(q, k, v, bias) ** 2)

    g_ref = jax.grad(loss_ref, (0, 1, 2, 3))(q, k, v, bias)
    g_pal = jax.grad(loss_pal, (0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("with_bias", [True, False])
@pytest.mark.parametrize("L,H", [(256, 2), (16, 32)])
def test_fused_attention_maxfree_parity(L, H, with_bias, monkeypatch):
    """ECG_ATTN_MAXFREE=1 (no per-row max tree; exp(min(x, 60)) with the
    normalizer folded in pv) vs the XLA path, fwd + grads: exact softmax
    for any logits <= 60, so random O(1) inputs must match at the same
    tolerance as the default kernel. Covers packed (L=16, P=8 block-diag
    -1e9 mask -> exp(-1e9) == 0 exactly) and unpacked (L=256) shapes."""
    monkeypatch.setenv("ECG_ATTN_MAXFREE", "1")
    B, D = 2, 4
    q, k, v = (_rand((B, H, L, D), i) for i in range(3))
    bias = _rand((1, H, L, L), 7) if with_bias else None
    ref = multi_head_attention(q, k, v, bias)
    out = ap.fused_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def loss_ref(q, k, v, bias):
        return jnp.sum(multi_head_attention(q, k, v, bias) ** 2)

    def loss_pal(q, k, v, bias):
        return jnp.sum(ap.fused_attention(q, k, v, bias) ** 2)

    argnums = (0, 1, 2, 3) if with_bias else (0, 1, 2)
    g_ref = jax.grad(loss_ref, argnums)(q, k, v, bias)
    g_pal = jax.grad(loss_pal, argnums)(q, k, v, bias)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_attention_maxfree_rpos_parity(monkeypatch):
    """Maxfree through the per-window rpos kernel (fwd + grads)."""
    monkeypatch.setenv("ECG_ATTN_MAXFREE", "1")
    B, H, L, D, W = 4, 8, 64, 4, 8
    q, k, v = (_rand((B, H, L, D), i) for i in range(3))
    toep = _toep(L, W, H)
    r_pos = jnp.asarray([0, 5, L // 2, L - 1], jnp.int32)
    offsets = (r_pos - W // 2).astype(jnp.float32)
    bias = _materialize_rpos(toep, offsets, W)

    def loss_ref(q, k, v, toep):
        bias = _materialize_rpos(toep, offsets, W)
        return jnp.sum(multi_head_attention(q, k, v, bias) ** 2)

    def loss_pal(q, k, v, toep):
        return jnp.sum(ap.fused_attention_rpos(q, k, v, toep, W, offsets) ** 2)

    out = ap.fused_attention_rpos(q, k, v, toep, W, offsets)
    ref = multi_head_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    g_ref = jax.grad(loss_ref, (0, 1, 2, 3))(q, k, v, toep)
    g_pal = jax.grad(loss_pal, (0, 1, 2, 3))(q, k, v, toep)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_maxfree_underflow_row_is_finite(monkeypatch):
    """A row whose every logit is < -87 underflows to an all-zero
    numerator under maxfree; the denominator floor must yield finite
    output (zeros), not 0/0 NaN."""
    monkeypatch.setenv("ECG_ATTN_MAXFREE", "1")
    B, H, L, D = 1, 2, 256, 4
    q, k, v = (_rand((B, H, L, D), i) for i in range(3))
    bias = jnp.full((1, H, L, L), -200.0, jnp.float32)  # all rows underflow
    out = ap.fused_attention(q, k, v, bias)
    assert np.isfinite(np.asarray(out)).all()
