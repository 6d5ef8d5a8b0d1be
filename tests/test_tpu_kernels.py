"""On-hardware (Mosaic-compiled) Pallas kernel coverage — TPU-gated.

The rest of the suite runs the kernels in interpret mode on CPU (fast,
semantics only); nothing there catches Mosaic lowering/layout regressions.
These tests execute the real kernels — forward AND custom-VJP backward —
on the chip (VERDICT round-1 item 6). They are skipped unless the session
keeps its TPU backend:

    ECG_TEST_TPU=1 python -m pytest tests/test_tpu_kernels.py -q

(tests/conftest.py forces CPU unless ECG_TEST_TPU=1.) Compiles go through
the remote tunnel (minutes cold; cached afterwards) — shapes here are kept
small and constant so the persistent compilation cache makes re-runs cheap.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="on-hardware Mosaic tests need a TPU backend (ECG_TEST_TPU=1)",
)


# Oracle precision mirroring (probe: runs/probe_precision.log). On TPU,
# DEFAULT-precision f32 matmuls round their INPUTS to bf16 (single MXU
# pass, ~2e-3 elementwise noise); the rounding is elementwise-deterministic,
# so two DEFAULT paths over the same values produce bit-correlated errors
# that cancel in a diff. Since 5cca7ad the kernel's pv matmul carries the
# folded softmax normalizer and runs at HIGHEST for f32 operands (med rel
# 9e-7 vs f64), while its qk matmul stays DEFAULT — so a correct oracle
# for FORWARD values keeps qk at DEFAULT (bit-correlated logits) and runs
# pv at HIGHEST (matching the kernel's near-exact pv). GRADIENT checks
# used to ride the same trick against an all-DEFAULT oracle, but the
# FLASH backward (1e94073) reorders the jacobian arithmetic (1/s folded
# into g before the dv matmul; delta-identity c; HIGHEST transposes), so
# its DEFAULT roundings no longer correlate with any XLA oracle's — the
# first on-chip flash run showed honest independent bf16 noise, max ~3e-2
# on O(1) grads (runs/r3l_tpu_kernel_tests.log). Gradients therefore
# compare against the HIGHEST oracle with distribution gates at the
# DEFAULT-noise scale: mean |err| (bulk) plus a loose elementwise tail.
_PV_HI = jax.lax.Precision.HIGHEST


def _attention_oracle(q, k, v, bias, pv_precision=None):
    logits = jnp.einsum("bhld,bhmd->bhlm", q, k)
    if bias is not None:
        logits = logits + bias
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhlm,bhmd->bhld", p, v, precision=pv_precision)


def test_fused_attention_fwd_bwd_on_chip():
    """attention_pallas.fused_attention forward + custom-VJP backward,
    Mosaic-compiled, vs the XLA einsum oracle."""
    from ecg_denoise_tpu.kernels.attention_pallas import fused_attention

    B, H, L, D = 8, 2, 32, 4
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(ks[0], (B, H, L, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, L, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, L, D), jnp.float32)
    bias = 0.1 * jax.random.normal(ks[3], (1, H, L, L), jnp.float32)
    cot = jax.random.normal(ks[4], (B, H, L, D), jnp.float32)

    def loss_k(q, k, v, bias):
        return jnp.sum(fused_attention(q, k, v, bias) * cot)

    def loss_o_hi(q, k, v, bias):
        return jnp.sum(_attention_oracle(q, k, v, bias, _PV_HI) * cot)

    vk, gk = jax.jit(jax.value_and_grad(loss_k, argnums=(0, 1, 2, 3)))(q, k, v, bias)
    # Forward value vs the pv-HIGHEST oracle; grads vs the HIGHEST
    # oracle at DEFAULT-noise-scale distribution gates — see the note.
    vo = jax.jit(loss_o_hi)(q, k, v, bias)
    go = jax.jit(jax.grad(loss_o_hi, argnums=(0, 1, 2, 3)))(q, k, v, bias)
    np.testing.assert_allclose(float(vk), float(vo), rtol=2e-5)
    for a, b, name in zip(gk, go, ("dq", "dk", "dv", "dbias")):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, atol=5e-2, rtol=5e-2, err_msg=name)
        assert float(np.mean(np.abs(a - b))) < 3e-3, name


def test_fused_layer_fwd_on_chip():
    """block_pallas.fused_layer (whole-stage forward) vs the flax
    BasicLayer, Mosaic-compiled."""
    from ecg_denoise_tpu.ops.attention import BasicLayer, sinusoidal_pe_table
    import ecg_denoise_tpu.kernels.block_pallas as bp

    L, C, H = 32, 8, 2
    layer = BasicLayer(dim=C, depth=2, num_heads=H, local_enhence=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, L, C), jnp.float32)
    bias = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (1, H, L, L))
    params = layer.init(jax.random.PRNGKey(0), x, bias)["params"]
    pe = sinusoidal_pe_table(1000, C)[0, :L, :]
    blocks = [params["blocks_0"], params["blocks_1"]]

    ref = jax.jit(lambda p, x: layer.apply({"params": p}, x, bias))(params, x)
    got = jax.jit(lambda x: bp.fused_layer(
        x, pe, bias, blocks, num_heads=H, local_enhence=True,
        mm_dtype=jnp.float32))(x)
    # On TPU, BOTH paths' f32 matmuls run bf16 MXU multiplies under jax's
    # default precision; they differ only in fusion/accumulation order, so
    # the on-chip gate is bf16-epsilon-scale (measured max |diff| 4e-3 on
    # O(1) activations), not the interpret-mode 2e-4.
    got, ref = np.asarray(got), np.asarray(ref)
    np.testing.assert_allclose(got, ref, atol=1e-2, rtol=5e-2)
    assert float(np.mean((got - ref) ** 2)) < 1e-5


def test_fused_layer_diff_bwd_on_chip():
    """block_pallas.fused_layer_diff backward (in-kernel jax.vjp, grads
    accumulated across the sequential grid) vs XLA autodiff of the flax
    layer — every block weight, dx and dbias, Mosaic-compiled."""
    from ecg_denoise_tpu.ops.attention import BasicLayer, sinusoidal_pe_table
    import ecg_denoise_tpu.kernels.block_pallas as bp

    L, C, H = 32, 8, 2
    layer = BasicLayer(dim=C, depth=2, num_heads=H, local_enhence=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, L, C), jnp.float32)
    bias = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (1, H, L, L))
    params = layer.init(jax.random.PRNGKey(0), x, bias)["params"]
    pe = sinusoidal_pe_table(1000, C)[0, :L, :]
    b3 = bias.reshape(H, L, L)
    cot = jax.random.normal(jax.random.PRNGKey(3), x.shape, jnp.float32)

    def loss_ref(params, x, bias):
        return jnp.sum(layer.apply({"params": params}, x, bias) * cot)

    def loss_pl(params, x, b3):
        blocks = [params["blocks_0"], params["blocks_1"]]
        y = bp.fused_layer_diff(x, pe, b3, blocks, num_heads=H,
                                local_enhence=True, mm_dtype=jnp.float32,
                                backend="pallas")
        return jnp.sum(y * cot)

    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(params, x, bias)
    g_pl = jax.jit(jax.grad(loss_pl, argnums=(0, 1, 2)))(params, x, b3)

    # bf16-MXU-scale gate, per-leaf relative Frobenius error: elementwise
    # atol is brittle when one leaf's gradients span O(0.05)..O(8) (a lone
    # near-zero element trips any atol that is meaningful for the rest).
    def check(got, ref, name):
        got, ref = np.asarray(got, np.float64), np.asarray(ref, np.float64)
        # Measured bf16-MXU recompute noise across a 2-block chain peaks at
        # ~4e-3 relative (both sides run bf16 multiplies under default
        # precision); a genuinely wrong gradient is O(1) relative.
        rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-12)
        assert rel < 1e-2, f"{name}: relative grad error {rel:.2e}"

    ref_leaves = {jax.tree_util.keystr(k): v for k, v in
                  jax.tree_util.tree_leaves_with_path(g_ref[0])}
    for k, got in jax.tree_util.tree_leaves_with_path(g_pl[0]):
        check(got, ref_leaves[jax.tree_util.keystr(k)], jax.tree_util.keystr(k))
    check(g_pl[1], g_ref[1], "dx")
    check(np.asarray(g_pl[2]).reshape(-1), np.asarray(g_ref[2]).reshape(-1),
          "dbias")


# --- production-shape tier (VERDICT r2 weak item 5) -------------------------
#
# The tests above pin Mosaic lowering at toy shapes; the benches and
# serving run at L=256 stages, batch buckets to 2048. These pin the
# production shapes so a Mosaic regression there surfaces as a red test,
# not a bad bench number. Shapes are constant for compile-cache reuse.


def test_fused_attention_production_shapes_on_chip():
    """Stage-1 (L=256, H=2) and the packed bottleneck shape (L=16, H=32)
    at serving batch, f32 vs the XLA oracle."""
    from ecg_denoise_tpu.kernels.attention_pallas import fused_attention

    for (L, H) in ((256, 2), (16, 32)):
        B, D = 256, 4
        ks = jax.random.split(jax.random.PRNGKey(L), 4)
        q = jax.random.normal(ks[0], (B, H, L, D), jnp.float32)
        k = jax.random.normal(ks[1], (B, H, L, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, H, L, D), jnp.float32)
        bias = 0.1 * jax.random.normal(ks[3], (1, H, L, L), jnp.float32)
        got = jax.jit(fused_attention)(q, k, v, bias)
        ref = jax.jit(lambda q, k, v, b: _attention_oracle(q, k, v, b,
                                                           _PV_HI))(
            q, k, v, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-3, rtol=5e-3,
                                   err_msg=f"L={L} H={H}")


def test_fused_attention_rpos_on_chip():
    """Per-window R-peak kernel (round-3 fast path) at stage-1 and a
    packed stage shape, fwd + bwd, Mosaic-compiled."""
    from ecg_denoise_tpu.kernels.attention_pallas import fused_attention_rpos
    from ecg_denoise_tpu.ops.attention import RPosBias

    for (L, W, H) in ((256, 32, 2), (32, 4, 16)):
        B, D = 256, 4
        ks = jax.random.split(jax.random.PRNGKey(W), 5)
        q = jax.random.normal(ks[0], (B, H, L, D), jnp.float32)
        k = jax.random.normal(ks[1], (B, H, L, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, H, L, D), jnp.float32)
        table = 0.1 * jax.random.normal(ks[3], (2 * W - 1, H), jnp.float32)
        pos = jnp.arange(L)
        rel = pos[:, None] - pos[None, :]
        idx = jnp.clip(rel + W - 1, 0, 2 * W - 2)
        toep = (table[idx] * (jnp.abs(rel) < W)[..., None]).transpose(
            2, 0, 1)[None]
        r_pos = jax.random.randint(ks[4], (B,), 0, L)
        offsets = (r_pos - W // 2).astype(jnp.float32)
        cot = jax.random.normal(ks[4], (B, H, L, D), jnp.float32)

        def loss_k(q, k, v, toep):
            return jnp.sum(fused_attention_rpos(q, k, v, toep, W, offsets) * cot)

        def loss_o(q, k, v, toep, pv=None):
            bias = RPosBias(toep=toep, offsets=offsets, W=W).materialize()
            return jnp.sum(_attention_oracle(q, k, v, bias, pv) * cot)

        vk, gk = jax.jit(jax.value_and_grad(loss_k, (0, 1, 2, 3)))(q, k, v, toep)
        # Value vs the pv-HIGHEST oracle (kernel pv is HIGHEST in f32);
        # the grad gate below is a rel-Frobenius 1e-2, wide enough for the
        # UNcorrelated bf16 noise either oracle leaves, so one oracle does.
        vo = jax.jit(lambda q, k, v, t: loss_o(q, k, v, t, _PV_HI))(
            q, k, v, toep)
        go = jax.jit(jax.grad(loss_o, (0, 1, 2, 3)))(q, k, v, toep)
        np.testing.assert_allclose(float(vk), float(vo), rtol=1e-4)
        for a, b, name in zip(gk, go, ("dq", "dk", "dv", "dtoep")):
            got, ref = np.asarray(a, np.float64), np.asarray(b, np.float64)
            relerr = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-12)
            assert relerr < 1e-2, f"L={L}: {name} rel err {relerr:.2e}"


def test_apply_fast_production_shape_on_chip():
    """Whole-stage fused inference engine vs RaleNet.apply at the full
    model production shape (batch 256, 2x256 windows), bf16 matmuls."""
    from ecg_denoise_tpu.models import RaleNet
    from ecg_denoise_tpu.models.ralenet_fast import apply_fast

    model = RaleNet(variant="full")
    x = jax.random.normal(jax.random.PRNGKey(0), (256, 2, 256), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x[:2],
                                           train=False))()
    ref = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    got = jax.jit(lambda v, x: apply_fast(v, x, variant="full",
                                          mm_dtype=jnp.bfloat16))(variables, x)
    got, ref = np.asarray(got), np.asarray(ref)
    # bf16 matmuls vs f32-param XLA: bf16-epsilon-scale gate on O(1) signals.
    assert float(np.mean((got - ref) ** 2)) < 1e-4
    np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.05)


def test_use_pallas_train_step_on_chip():
    """One jitted train step through the attention-kernel custom-VJP at
    batch 256 — the measured-fastest trainer's exact path."""
    import optax

    from ecg_denoise_tpu.models import RaleNet
    from ecg_denoise_tpu.train.state import create_train_state
    from ecg_denoise_tpu.train.steps import make_epoch_fns

    model = RaleNet(variant="full", use_pallas=True)
    n, bs = 256, 256
    rng = np.random.default_rng(0)
    noisy = jnp.asarray(rng.standard_normal((n, 2, 256)), jnp.float32)
    clean = noisy * 0.5
    state, tx = create_train_state(model, jax.random.PRNGKey(0), noisy[:2])
    train_epoch, eval_epoch = make_epoch_fns(model, tx, donate=False)
    state, m = train_epoch(state, noisy, clean, jax.random.PRNGKey(1), bs)
    m = jax.device_get(m)
    assert np.isfinite(m["loss"]) and np.isfinite(m["snr"])
    ev = jax.device_get(eval_epoch(state, noisy, clean, bs))
    assert np.isfinite(ev["snr"])



def test_apply_packed_production_shape_on_chip():
    """Window-packed forward vs RaleNet.apply at the production shape
    (batch 256), both matmul dtypes: f32 tight (the packed Dense forms are
    bitwise-identical; LN/attention differ only in summation order and the
    kernel's DEFAULT-qk bf16 input rounding), bf16 at the bf16-noise gate."""
    from ecg_denoise_tpu.models import RaleNet
    from ecg_denoise_tpu.models.ralenet_packed import apply_packed

    model = RaleNet(variant="full")
    x = jax.random.normal(jax.random.PRNGKey(2), (256, 2, 256), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x[:2],
                                           train=False))()
    ref = np.asarray(
        jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x))
    got32 = np.asarray(jax.jit(
        lambda v, x: apply_packed(v, x, variant="full",
                                  mm_dtype=jnp.float32))(variables, x))
    # f32 packed vs f32 XLA: the attention kernel's DEFAULT-precision qk
    # rounds f32 inputs to bf16 (probe_precision.log), so the gate is the
    # elementwise-bf16-noise scale, not 1e-5. That noise is random-signed
    # with heavy tails: the first chip run (runs/r3k_tpu_kernel_tests.log)
    # had 8/131072 elements at up to 7.6e-3 — gate the tail at 2e-2 and
    # pin the bulk with a mean-abs-error bound instead.
    np.testing.assert_allclose(got32, ref, atol=2e-2, rtol=2e-2)
    # first chip run measured mean |err| 9.7e-4 — exactly the bf16
    # input-rounding scale on O(0.5) values (runs/r3l_tpu_kernel_tests.log)
    assert float(np.mean(np.abs(got32 - ref))) < 2e-3
    got16 = np.asarray(jax.jit(
        lambda v, x: apply_packed(v, x, variant="full",
                                  mm_dtype=jnp.bfloat16))(variables, x))
    assert float(np.mean((got16 - ref) ** 2)) < 1e-4
    np.testing.assert_allclose(got16, ref, atol=0.05, rtol=0.05)


def test_packed_train_step_on_chip():
    """One jitted window-packed train epoch (fwd + flash-VJP backward +
    Adam) with detected per-window R peaks at batch 256."""
    from ecg_denoise_tpu.models import RaleNet
    from ecg_denoise_tpu.train.state import create_train_state
    from ecg_denoise_tpu.train.steps import make_epoch_fns

    model = RaleNet(variant="full", use_pallas=True)
    n, bs = 256, 256
    rng = np.random.default_rng(1)
    noisy = jnp.asarray(rng.standard_normal((n, 2, 256)), jnp.float32)
    clean = noisy * 0.5
    state, tx = create_train_state(model, jax.random.PRNGKey(0), noisy[:2])
    train_epoch, eval_epoch = make_epoch_fns(
        model, tx, donate=False, detect_r_pos=True, packed_variant="full")
    state, m = train_epoch(state, noisy, clean, jax.random.PRNGKey(1), bs)
    m = jax.device_get(m)
    assert np.isfinite(m["loss"]) and np.isfinite(m["snr"])
    ev = jax.device_get(eval_epoch(state, noisy, clean, bs))
    assert np.isfinite(ev["snr"])
