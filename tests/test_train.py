"""Training-loop tests: one jitted epoch improves the model, checkpoints
round-trip, frozen masks freeze, result line matches the reference format."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from ecg_denoise_tpu.models import build_model, NewRale
from ecg_denoise_tpu.models.ralenet_12leads import frozen_param_mask
from ecg_denoise_tpu.train import create_train_state, make_epoch_fns, fit
from ecg_denoise_tpu.train.checkpoint import save_checkpoint, load_checkpoint, find_model


def _toy_data(rng, n=64, c=2, l=256):
    clean = np.stack(
        [np.sin(np.linspace(0, 6 * np.pi, l) + p) for p in rng.uniform(0, 6, n * c)]
    ).reshape(n, c, l)
    noisy = clean + 0.5 * rng.standard_normal((n, c, l))
    return noisy.astype(np.float32), clean.astype(np.float32)


def test_train_epoch_reduces_loss(rng):
    model = build_model("unet")
    noisy, clean = _toy_data(rng)
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), jnp.asarray(noisy[:2]), learning_rate=3e-3
    )
    train_epoch, eval_epoch = make_epoch_fns(model, tx, donate=False)
    m0 = eval_epoch(state, jnp.asarray(noisy), jnp.asarray(clean), 16)
    for i in range(10):
        state, tm = train_epoch(state, jnp.asarray(noisy), jnp.asarray(clean), jax.random.PRNGKey(i), 16)
    m1 = eval_epoch(state, jnp.asarray(noisy), jnp.asarray(clean), 16)
    assert float(m1["loss"]) < float(m0["loss"])
    assert float(m1["snr"]) > float(m0["snr"])


def test_eval_handles_ragged_tail(rng):
    model = build_model("unet")
    noisy, clean = _toy_data(rng, n=50)  # 50 % 16 != 0
    state, tx = create_train_state(model, jax.random.PRNGKey(0), jnp.asarray(noisy[:2]))
    _, eval_epoch = make_epoch_fns(model, tx, donate=False)
    m = eval_epoch(state, jnp.asarray(noisy), jnp.asarray(clean), 16)
    assert np.isfinite(float(m["snr"])) and np.isfinite(float(m["loss"]))


def test_fit_end_to_end(tmp_path, rng):
    model = build_model("unet")
    noisy, clean = _toy_data(rng, n=96)
    out_file = str(tmp_path / "output.txt")
    state, hist = fit(
        model,
        noisy[:64], clean[:64], noisy[64:], clean[64:],
        epochs=10, batch_size=16, learning_rate=3e-3, model_name="unet",
        noise_name="bw", noise_intensity=-4,
        model_save_dir=str(tmp_path / "model_save"),
        output_file=out_file, verbose=False,
    )
    train_snr, test_snr, train_rmse, test_rmse = hist
    assert len(train_snr) == 10
    assert test_snr[-1] > test_snr[0]
    # Checkpoint written at epoch 10 under the reference naming scheme.
    ckpt = tmp_path / "model_save" / "unet" / "unet_9_bw_intensity-4.msgpack"
    assert ckpt.exists()
    line = open(out_file).read().strip()
    assert line.startswith("unet_9_bw_intensity-4:snr:") and ", rmse:" in line
    # find_model discovers the latest checkpoint.
    assert find_model(str(tmp_path / "model_save" / "unet"), "unet") == str(ckpt)


def test_checkpoint_roundtrip(rng):
    model = build_model("unet")
    noisy, clean = _toy_data(rng, n=32)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), jnp.asarray(noisy[:2]))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "ck", "x.msgpack")
        save_checkpoint(p, state)
        state2, _ = create_train_state(model, jax.random.PRNGKey(1), jnp.asarray(noisy[:2]))
        state2 = load_checkpoint(p, state2)
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_frozen_core_stays_frozen(rng):
    model = NewRale()
    x12 = rng.standard_normal((32, 12, 256)).astype(np.float32)
    y12 = (x12 + 0.1).astype(np.float32)
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), jnp.asarray(x12[:2]),
        frozen_mask=None,
    )
    mask = frozen_param_mask(state.params)
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), jnp.asarray(x12[:2]), frozen_mask=mask
    )
    train_epoch, _ = make_epoch_fns(model, tx, donate=False)
    before = jax.tree_util.tree_map_with_path(lambda p, v: np.asarray(v), state.params)
    state, _ = train_epoch(state, jnp.asarray(x12), jnp.asarray(y12), jax.random.PRNGKey(0), 16)

    def path_has_rale(path):
        return any(getattr(k, "key", None) == "rale" for k in path)

    flat_before = jax.tree_util.tree_flatten_with_path(before)[0]
    flat_after = jax.tree_util.tree_flatten_with_path(state.params)[0]
    changed_rale = changed_adapter = False
    for (pb, vb), (pa, va) in zip(flat_before, flat_after):
        same = np.allclose(vb, np.asarray(va))
        if path_has_rale(pb):
            assert same, f"frozen param changed: {pb}"
        elif not same:
            changed_adapter = True
    assert changed_adapter


def test_on_device_augmented_epoch(rng):
    """On-device SNR-targeted augmentation inside the jitted epoch trains
    and hits the target SNR distribution (TPU-native extension)."""
    from ecg_denoise_tpu.train.steps import make_augmented_epoch_fn
    from ecg_denoise_tpu.data.noise import jax_snr_noise_add

    model = build_model("unet")
    _, clean = _toy_data(rng, n=64)
    noise_record = rng.standard_normal((10_000, 2)).astype(np.float32)
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), jnp.asarray(clean[:2]), learning_rate=3e-3
    )
    train_epoch = make_augmented_epoch_fn(model, tx, noise_record, snr_db=0.0,
                                          donate=False)
    losses = []
    for i in range(4):
        state, m = train_epoch(state, jnp.asarray(clean), jax.random.PRNGKey(i), 16)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]

    # The mixer itself hits the requested SNR per window.
    noisy = jax_snr_noise_add(jnp.asarray(clean), jnp.asarray(noise_record),
                              6.0, jax.random.PRNGKey(9))
    sig = jnp.mean(jnp.asarray(clean) ** 2, axis=(1, 2))
    err = jnp.mean((noisy - clean) ** 2, axis=(1, 2))
    snrs = 10 * jnp.log10(sig / err)
    np.testing.assert_allclose(np.asarray(snrs), 6.0, atol=0.05)


def test_train_epoch_without_batchnorm(rng):
    """Models with NO BatchNorm (ACDAE) must scan-train: empty batch_stats
    carry types must match (regression: FrozenDict-in/dict-out broke this)."""
    model = build_model("ACDAE")
    noisy, clean = _toy_data(rng, n=32)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), jnp.asarray(noisy[:2]))
    train_epoch, eval_epoch = make_epoch_fns(model, tx, donate=False)
    state, m = train_epoch(state, jnp.asarray(noisy), jnp.asarray(clean), jax.random.PRNGKey(0), 16)
    ev = eval_epoch(state, jnp.asarray(noisy), jnp.asarray(clean), 16)
    assert np.isfinite(float(m["loss"])) and np.isfinite(float(ev["snr"]))
