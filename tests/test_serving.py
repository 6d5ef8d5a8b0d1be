"""Serving-layer tests: checkpoint restore, bucketing, shape handling."""

import numpy as np
import jax
import jax.numpy as jnp

from ecg_denoise_tpu.models import build_model
from ecg_denoise_tpu.serving import Denoiser, _bucket
from ecg_denoise_tpu.train.state import create_train_state
from ecg_denoise_tpu.train.checkpoint import save_checkpoint


def test_bucket_sizes():
    assert _bucket(1, 64) == 1
    assert _bucket(5, 64) == 8
    assert _bucket(64, 64) == 64
    assert _bucket(1000, 64) == 64  # capped at max_batch


def test_denoiser_from_checkpoint(tmp_path):
    model = build_model("unet")
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((2, 2, 256), jnp.float32)
    )
    ckpt = str(tmp_path / "ck.msgpack")
    save_checkpoint(ckpt, state)
    d = Denoiser.from_checkpoint("unet", ckpt, max_batch=16)

    # Odd batch size pads to a bucket but returns exactly n rows.
    x = np.random.default_rng(0).standard_normal((7, 2, 256)).astype(np.float32)
    y = d(x)
    assert y.shape == x.shape and y.dtype == np.float32
    # Chunking beyond max_batch covers every row (37 = 16+16+5).
    x2 = np.random.default_rng(1).standard_normal((37, 2, 256)).astype(np.float32)
    y2 = d(x2)
    np.testing.assert_allclose(y2[:7], d(x2[:7]), atol=1e-5)
    # Single (C, L) window round-trips without a batch dim.
    y1 = d(x[0])
    np.testing.assert_allclose(y1, y[0], atol=1e-5)


class _PassthroughDenoiser(Denoiser):
    """Denoiser whose model is identity — isolates the overlap-add math."""

    def __init__(self):  # noqa: super().__init__ replaced on purpose
        import threading

        self.max_batch = 16
        self._staging = {}
        self._lock = threading.Lock()
        self._bucket_floor = 1
        self.inference_path = "passthrough"
        self._fwd = lambda batch: batch


def test_denoise_record_passthrough_identity():
    """Overlap-add stitching of an identity model reproduces the record
    exactly: interior positions blend agreeing windows, edge positions are
    covered once and the eps-floored Hann weights cancel."""
    d = _PassthroughDenoiser()
    sig = np.random.default_rng(3).standard_normal((2, 1000)).astype(np.float32)
    for stride in (64, 128, 200, 256):
        out = d.denoise_record(sig, stride=stride)
        assert out.shape == sig.shape
        np.testing.assert_allclose(out, sig, atol=1e-5, err_msg=f"stride={stride}")
    # Short record: reflect-pad, one window, crop.
    short = sig[:, :100]
    np.testing.assert_allclose(d.denoise_record(short), short, atol=1e-5)
    # Length not a multiple of stride: tail flush window covers it.
    odd = sig[:, :777]
    np.testing.assert_allclose(d.denoise_record(odd, stride=96), odd, atol=1e-5)


def test_denoise_record_real_model(tmp_path):
    """A real (untrained) model through the record path: right shape, and
    the fully-covered interior matches windowed application where all
    windows agree is not required — just finite output and the edge
    windows' exact reproduction at the first/last stride-free samples."""
    model = build_model("unet")
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((2, 2, 256), jnp.float32)
    )
    ckpt = str(tmp_path / "ck.msgpack")
    save_checkpoint(ckpt, state)
    d = Denoiser.from_checkpoint("unet", ckpt, max_batch=16)
    sig = np.random.default_rng(4).standard_normal((2, 700)).astype(np.float32)
    out = d.denoise_record(sig, stride=128)
    assert out.shape == sig.shape and np.isfinite(out).all()
    # Position 0 is covered only by the first window -> exactly its output.
    w0 = d(sig[:, :256][None])[0]
    np.testing.assert_allclose(out[:, 0], w0[:, 0], rtol=1e-4, atol=1e-5)


def test_denoiser_mesh_dp_matches_single_device(tmp_path):
    """DP mesh serving == single-device serving: params replicate, the
    batch shards on 'data', jit-SPMD gathers on fetch. Tolerance is tight
    but not exact — the partitioned program compiles different fusions
    than the single-device one (float reassociation ~1e-4 relative)."""
    from ecg_denoise_tpu.parallel.mesh import make_mesh

    model = build_model("unet")
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((2, 2, 256), jnp.float32)
    )
    ckpt = str(tmp_path / "ck.msgpack")
    save_checkpoint(ckpt, state)

    single = Denoiser.from_checkpoint("unet", ckpt, max_batch=32)
    mesh = make_mesh(n_data=8, n_model=1)
    dp = Denoiser.from_checkpoint("unet", ckpt, max_batch=32, mesh=mesh)
    assert "+dp8" in dp.inference_path

    # Odd batch (11 -> bucket 16, two windows per device) and a
    # sub-mesh-size request (3 -> floor bucket 8).
    for n in (11, 3, 32):
        x = np.random.default_rng(n).standard_normal((n, 2, 256)).astype(np.float32)
        np.testing.assert_allclose(dp(x), single(x), rtol=1e-3, atol=1e-5)

    # Mesh + kernel serving composes since round 5: the fwd traces inside
    # the mesh context, so fused attention dispatches to its shard_map
    # twins (kernels/attention_pallas.py _data_mesh; interpret-mode on
    # this CPU mesh). DP kernel serving must match single-device kernel
    # serving.
    model_k = build_model("ralenet", use_pallas=True)
    state_k, _ = create_train_state(
        model_k, jax.random.PRNGKey(0), jnp.zeros((2, 2, 256), jnp.float32)
    )
    vars_k = {"params": state_k.params, "batch_stats": state_k.batch_stats}
    single_k = Denoiser(model_k, vars_k, max_batch=16)
    dp_k = Denoiser(model_k, vars_k, max_batch=16, mesh=mesh)
    assert "+attn-pallas+dp8" in dp_k.inference_path
    x = np.random.default_rng(7).standard_normal((16, 2, 256)).astype(np.float32)
    np.testing.assert_allclose(dp_k(x), single_k(x), rtol=1e-3, atol=1e-5)


def test_streaming_matches_denoise_record_passthrough():
    """push()/flush() over arbitrary chunk sizes reproduces
    denoise_record exactly for an identity model: same window starts
    (incl. the off-grid tail flush), same Hann overlap-add."""
    rng = np.random.default_rng(7)
    for t, stride in ((1000, 128), (777, 96), (512, 128), (300, 256),
                      (100, 128)):
        d = _PassthroughDenoiser()
        sig = rng.standard_normal((2, t)).astype(np.float32)
        want = d.denoise_record(sig, stride=stride)

        s = d.streaming(stride=stride)
        chunks, i = [], 0
        while i < t:
            k = int(rng.integers(1, 200))
            chunks.append(s.push(sig[:, i:i + k]))
            i += min(k, t - i)
        chunks.append(s.flush())
        got = np.concatenate([c for c in chunks if c.size], axis=1)
        assert got.shape == sig.shape, (t, stride, got.shape)
        np.testing.assert_allclose(got, want, atol=1e-5,
                                   err_msg=f"t={t} stride={stride}")


def test_streaming_real_model_and_api(tmp_path):
    model = build_model("unet")
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((2, 2, 256), jnp.float32)
    )
    ckpt = str(tmp_path / "ck.msgpack")
    save_checkpoint(ckpt, state)
    d = Denoiser.from_checkpoint("unet", ckpt, max_batch=16)

    sig = np.random.default_rng(8).standard_normal((2, 700)).astype(np.float32)
    want = d.denoise_record(sig, stride=128)
    s = d.streaming(stride=128)
    out = [s.push(sig[:, :400]), s.push(sig[:, 400:]), s.flush()]
    got = np.concatenate([c for c in out if c.size], axis=1)
    # Different batch compositions compile different bucket programs ->
    # float noise, not bit equality.
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="flushed"):
        s.push(sig[:, :10])
    with _pytest.raises(ValueError, match="stride"):
        d.streaming(stride=0)


def test_denoiser_loads_frozen_mask_checkpoint(tmp_path):
    """Transfer-learning checkpoints carry a multi_transform (frozen-mask)
    opt_state that a plain TrainState template cannot restore; serving
    must load params/batch_stats regardless (round-4 12-lead serve bug)."""
    from ecg_denoise_tpu.models import NewRale
    from ecg_denoise_tpu.models.ralenet_12leads import frozen_param_mask

    model = NewRale()
    sample = jnp.zeros((2, 12, 256), jnp.float32)
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0), sample,
        frozen_mask=None)
    mask = frozen_param_mask(state.params)
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0), sample, frozen_mask=mask)
    ckpt = str(tmp_path / "newrale.msgpack")
    save_checkpoint(ckpt, state)
    d = Denoiser.from_checkpoint("newrale", ckpt, sample_shape=(2, 12, 256),
                                 max_batch=16)
    x = np.random.default_rng(1).standard_normal((3, 12, 256)).astype(
        np.float32)
    y = d(x)
    assert y.shape == (3, 12, 256) and np.isfinite(y).all()


def test_denoiser_channels_derived_from_model():
    """ADVICE r4: a directly-constructed 12-lead Denoiser derives its
    window channel count from the model (`NewRale.in_channels`), so
    warmup() pre-compiles the buckets that will actually serve; 2-lead
    families keep the default 2. An explicit warmup(channels=) is honored
    verbatim — 0 must not silently fall back to the default."""
    d12 = Denoiser(build_model("newrale"), variables={}, max_batch=4)
    assert d12.channels == 12
    d2 = Denoiser(build_model("unet"), variables={}, max_batch=4)
    assert d2.channels == 2

    seen = []
    d12._fwd = lambda b: (seen.append(tuple(b.shape)), b)[1]
    d12.warmup(length=32, limit=2)
    assert seen and all(s[1] == 12 for s in seen)

    seen.clear()
    d12.warmup(channels=5, length=32, limit=2)
    assert seen and all(s[1] == 5 for s in seen)
