"""Metric parity tests vs. the reference formulas (evaluate.py, test_cls.py).

torch (CPU) is available in the image, so we check our jnp metrics against
literal torch transcriptions of the reference formulas on random data.
"""

import numpy as np
import jax.numpy as jnp
import torch
import pytest

from ecg_denoise_tpu.metrics import RMSE, SNR, PRD, snr_improvement, accuracy, precision, f1_score


def _torch_rmse(y, y_pred):
    y = y.flatten(start_dim=1)
    y_pred = y_pred.flatten(start_dim=1)
    return torch.sqrt(torch.mean((y - y_pred) ** 2, dim=-1))


def _torch_snr(y, y_pred):
    y = y.flatten(start_dim=1)
    y_pred = y_pred.flatten(start_dim=1)
    return 10 * torch.log10(torch.mean(y**2, dim=-1) / torch.mean((y - y_pred) ** 2, dim=-1))


def test_rmse_snr_match_reference_formulas(rng):
    y = rng.standard_normal((8, 2, 256)).astype(np.float32)
    yp = (y + 0.1 * rng.standard_normal((8, 2, 256))).astype(np.float32)
    got_rmse = np.asarray(RMSE(jnp.asarray(y), jnp.asarray(yp)))
    got_snr = np.asarray(SNR(jnp.asarray(y), jnp.asarray(yp)))
    want_rmse = _torch_rmse(torch.tensor(y), torch.tensor(yp)).numpy()
    want_snr = _torch_snr(torch.tensor(y), torch.tensor(yp)).numpy()
    np.testing.assert_allclose(got_rmse, want_rmse, rtol=1e-5)
    np.testing.assert_allclose(got_snr, want_snr, rtol=1e-4)


def test_snr_scale_invariance(rng):
    # The reference's own __main__ probe (evaluate.py:53-60).
    y = rng.standard_normal((2, 3, 4))
    yp = rng.standard_normal((2, 3, 4))
    a = np.asarray(SNR(jnp.asarray(y), jnp.asarray(yp)))
    b = np.asarray(SNR(jnp.asarray(10 * y), jnp.asarray(10 * yp)))
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_snr_improvement(rng):
    y = rng.standard_normal((4, 2, 64))
    noisy = y + rng.standard_normal((4, 2, 64))
    imp = snr_improvement(jnp.asarray(y), jnp.asarray(noisy), jnp.asarray(y + 0.01 * (noisy - y)))
    assert np.all(np.asarray(imp) > 0)


def test_prd_basic(rng):
    y = rng.standard_normal((4, 2, 64))
    assert np.allclose(np.asarray(PRD(jnp.asarray(y), jnp.asarray(y))), 0.0)


def test_cls_metrics_match_reference(rng):
    logits = rng.standard_normal((64, 2)).astype(np.float32)
    labels = rng.integers(0, 2, 64)
    tl, tlab = torch.tensor(logits), torch.tensor(labels)

    pred = torch.argmax(tl, dim=1)
    want_acc = torch.sum(pred == tlab).item() / len(tlab)
    tp = torch.sum(pred * tlab).item()
    fp = torch.sum(pred * (1 - tlab)).item()
    fn = torch.sum((1 - pred) * tlab).item()

    assert accuracy(jnp.asarray(logits), jnp.asarray(labels)) == pytest.approx(want_acc)
    assert precision(jnp.asarray(logits), jnp.asarray(labels)) == pytest.approx(tp / (tp + fp), rel=1e-6)
    assert f1_score(jnp.asarray(logits), jnp.asarray(labels)) == pytest.approx(
        tp / (tp + 0.5 * (fp + fn)), rel=1e-6
    )
