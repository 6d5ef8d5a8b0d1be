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
