"""Data pipeline tests: SNR-targeted mixing, synthetic records, cache build +
dataset load + split determinism."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecg_denoise_tpu.data.noise import gnoisegen, single_snr_noise_add, batch_snr_noise_add, jax_snr_noise_add
from ecg_denoise_tpu.data.synth import synth_ecg_record, synth_noise_record
from ecg_denoise_tpu.data.cache import build_dict_data
from ecg_denoise_tpu.data.dataset import EcgDataset, load_split_arrays, sample_and_split
from ecg_denoise_tpu.metrics import SNR


def _measured_snr(clean, noisy):
    c, n = clean.ravel(), noisy.ravel()
    return 10 * np.log10(np.mean(c**2) / np.mean((n - c) ** 2))


def test_gnoisegen_hits_target_snr(rng):
    x = rng.standard_normal((1000, 2))
    y = rng.standard_normal((1000, 2)) * 5
    for snr in (-4, 0, 4):
        noisy, _ = gnoisegen(x, y, snr)
        assert _measured_snr(x, noisy) == pytest.approx(snr, abs=1e-6)


def test_single_snr_noise_add(rng):
    x = rng.standard_normal((256, 2))
    n = rng.standard_normal((256, 2)) * 0.1
    noisy = single_snr_noise_add(x, n, 2.0)
    assert _measured_snr(x, noisy) == pytest.approx(2.0, abs=1e-6)


def test_batch_snr_noise_add(rng):
    data = rng.standard_normal((4, 256, 2))
    record = rng.standard_normal((10_000, 2))
    noisy = batch_snr_noise_add(data, record, -4.0, rng)
    for i in range(4):
        assert _measured_snr(data[i], noisy[i]) == pytest.approx(-4.0, abs=1e-4)


def test_jax_snr_noise_add(rng):
    data = jnp.asarray(rng.standard_normal((4, 2, 256)), jnp.float32)
    record = jnp.asarray(rng.standard_normal((10_000, 2)), jnp.float32)
    noisy = jax_snr_noise_add(data, record, -4.0, jax.random.PRNGKey(0))
    snrs = np.asarray(SNR(data, noisy))  # SNR(clean, noisy) == input snr
    np.testing.assert_allclose(snrs, -4.0, atol=1e-3)


def test_synth_records():
    ecg = synth_ecg_record(0, length=20_000)
    assert ecg.shape == (20_000, 2)
    for kind in ("bw", "ma", "em"):
        nz = synth_noise_record(kind, 0, length=20_000)
        assert nz.shape == (20_000, 2)
        np.testing.assert_allclose(nz.std(axis=0), 1.0, atol=0.05)
    # bw should be much smoother than ma: compare first-difference energy.
    bw = synth_noise_record("bw", 0, length=20_000)
    ma = synth_noise_record("ma", 0, length=20_000)
    assert np.abs(np.diff(bw[:, 0])).mean() < 0.1 * np.abs(np.diff(ma[:, 0])).mean()


def test_synth_record_pvc_mixing():
    """pvc_prob=0 is byte-stable with the pre-PVC generator (same RNG
    stream); pvc_prob>0 swaps that fraction of beats to V morphology
    (wider, larger QRS) so the denoiser corpus covers ectopic beats."""
    a = synth_ecg_record(5, length=40_000)
    c = synth_ecg_record(5, length=40_000, pvc_prob=0.0)
    np.testing.assert_array_equal(a, c)
    b = synth_ecg_record(5, length=40_000, pvc_prob=1.0)
    assert b.shape == a.shape
    assert not np.allclose(a, b)
    # All-V records carry far more energy (wide QRS, amp 1.4 vs narrow 1.1).
    assert (b[:, 0] ** 2).mean() > 1.5 * (a[:, 0] ** 2).mean()


@pytest.fixture(scope="module")
def small_cache(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dict_data"))
    info = build_dict_data(out, n_synth_records=1, intensities=(-4, 0))
    return out, info


def test_cache_layout_and_alignment(small_cache):
    out, info = small_cache
    assert os.path.exists(os.path.join(out, "ecg.npy"))
    for d in ("m4", "0"):
        for n in ("bw", "ma", "em", "emb"):
            assert os.path.exists(os.path.join(out, d, n + ".npy"))
    clean = np.load(os.path.join(out, "ecg.npy"))
    noisy = np.load(os.path.join(out, "m4", "emb.npy"))
    assert clean.shape == noisy.shape
    assert clean.shape[1:] == (2, 256)
    assert clean.shape[0] == info["n_windows"]
    # Windows are z-normed per stretch: global mean approx 0.
    assert abs(clean.mean()) < 0.05
    # Measured SNR over the full corpus should be close to -4 dB.
    snr = _measured_snr(clean, noisy)
    assert snr == pytest.approx(-4.0, abs=0.5)


def test_dataset_and_split(small_cache):
    out, _ = small_cache
    ds = EcgDataset("emb", -4, path=out)
    assert len(ds) > 0
    noisy, clean = ds[0]
    assert noisy.shape == (2, 256) and clean.shape == (2, 256)

    tr, te = sample_and_split(len(ds), n_select=min(len(ds), 500))
    assert len(set(tr) & set(te)) == 0
    tr2, te2 = sample_and_split(len(ds), n_select=min(len(ds), 500))
    np.testing.assert_array_equal(tr, tr2)

    a = load_split_arrays("emb", -4, path=out, n_select=200)
    assert a[0].shape[0] == 160 and a[2].shape[0] == 40
    assert a[0].dtype == np.float32


def test_dataset_multi_noise_alignment(tmp_path):
    """A list of noise names tiles the clean windows to stay index-aligned
    (the reference's list API is latently misaligned; ours must not be)."""
    import os
    from ecg_denoise_tpu.data.dataset import EcgDataset

    d = tmp_path / "dict_data"
    (d / "m4").mkdir(parents=True)
    n = 8
    clean = np.arange(n * 2 * 256, dtype=np.float32).reshape(n, 2, 256)
    np.save(d / "ecg.npy", clean)
    np.save(d / "m4" / "bw.npy", clean + 1)
    np.save(d / "m4" / "ma.npy", clean + 2)
    ds = EcgDataset(["bw", "ma"], -4, path=str(d))
    assert len(ds) == 2 * n
    noisy, ground = ds[n + 3]  # row 3 of the 'ma' block
    np.testing.assert_array_equal(ground, clean[3])
    np.testing.assert_array_equal(noisy, clean[3] + 2)


def test_atr_annotation_roundtrip(tmp_path):
    """wrann -> rdann reproduces (samples, symbols) exactly, covering both
    short intervals and >1023-sample gaps (the SKIP 32-bit interval path of
    the MIT annotation format)."""
    from ecg_denoise_tpu.data.wfdb_io import rdann, wrann

    samples = np.array([10, 300, 1500, 1501, 200_000, 700_000], np.int64)
    symbols = ["N", "V", "N", "A", "V", "N"]
    wrann(str(tmp_path / "rec"), samples, symbols)
    got_s, got_sym = rdann(str(tmp_path / "rec"))
    np.testing.assert_array_equal(got_s, samples)
    assert got_sym == symbols


def test_atr_skips_aux_and_field_words(tmp_path):
    """rdann must skip NUM/SUB/CHN field updates and AUX byte payloads
    (hand-assembled stream per the WFDB annot(5) layout)."""
    from ecg_denoise_tpu.data.wfdb_io import rdann

    words = []
    words.append((1 << 10) | 100)   # N at t=100
    words.append((61 << 10) | 1)    # SUB update (discard)
    words.append((63 << 10) | 3)    # AUX, 3 bytes -> 2 payload words
    words.extend([0x4142, 0x0043])
    words.append((5 << 10) | 50)    # V at t=150
    words.append(0)                 # terminator
    np.asarray(words, dtype="<u2").tofile(tmp_path / "rec.atr")
    s, sym = rdann(str(tmp_path / "rec"))
    np.testing.assert_array_equal(s, [100, 150])
    assert sym == ["N", "V"]


def test_atr_negative_skip_roundtrip(tmp_path):
    """The 32-bit SKIP interval is SIGNED in the WFDB C reference: wrann
    encodes backward-in-time annotations via a negative two's-complement
    skip, which rdann must reconstruct as negative (it previously read the
    word pair unsigned, teleporting the annotation to t~4.29e9)."""
    from ecg_denoise_tpu.data.wfdb_io import rdann, wrann

    p = str(tmp_path / "rec")
    samples = [100, 50, 2000]  # out-of-order -> negative delta at index 1
    symbols = ["N", "V", "N"]
    wrann(p, samples, symbols)
    got_s, got_sym = rdann(p)
    np.testing.assert_array_equal(got_s, samples)
    assert got_sym == symbols


def test_annotated_synth_record_has_both_classes():
    from ecg_denoise_tpu.data.synth import synth_ecg_record_annotated

    sig, beats, labels = synth_ecg_record_annotated(0, length=100_000)
    assert sig.shape == (100_000, 2)
    assert beats.shape == labels.shape
    assert (np.diff(beats) > 0).all()
    assert 0.05 < labels.mean() < 0.6  # both N and V present
    # R peaks land where annotated: channel-0 amplitude at the beat sample
    # is large vs the record's overall level.
    at_beats = np.abs(sig[beats[labels == 0], 0]).mean()
    assert at_beats > 3 * np.abs(sig[:, 0]).mean()
