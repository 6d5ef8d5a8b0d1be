"""DWT baseline tests: filter-bank correctness, perfect reconstruction,
pywt-convention coefficient lengths, and denoiser behavior."""

import numpy as np
import pytest

from ecg_denoise_tpu.baselines.dwt import (
    daubechies_filters,
    dwt_max_level,
    wavedec,
    waverec,
    wavelet_denoise,
)
from ecg_denoise_tpu.baselines.fft import fft_denoise


# Published pywt filter values (double precision).
PYWT_DB1_REC_LO = [0.7071067811865476, 0.7071067811865476]
PYWT_DB2_REC_LO = [
    0.48296291314469025,
    0.836516303737469,
    0.22414386804185735,
    -0.12940952255092145,
]
PYWT_DB4_REC_LO = [
    0.23037781330885523,
    0.7148465705525415,
    0.6308807679295904,
    -0.02798376941698385,
    -0.18703481171888114,
    0.030841381835986965,
    0.032883011666982945,
    -0.010597401784997278,
]


@pytest.mark.parametrize(
    "n,known",
    [(1, PYWT_DB1_REC_LO), (2, PYWT_DB2_REC_LO), (4, PYWT_DB4_REC_LO)],
)
def test_daubechies_filters_match_pywt_tables(n, known):
    _, _, rec_lo, _ = daubechies_filters(n)
    np.testing.assert_allclose(rec_lo, known, atol=1e-10)


def test_filter_bank_relations():
    dec_lo, dec_hi, rec_lo, rec_hi = daubechies_filters(8)
    assert len(rec_lo) == 16
    np.testing.assert_allclose(dec_lo, rec_lo[::-1])
    np.testing.assert_allclose(dec_hi, rec_hi[::-1])
    # Orthonormality: sum lo = sqrt(2), sum hi = 0, unit energy.
    assert np.isclose(rec_lo.sum(), np.sqrt(2))
    assert np.isclose(rec_hi.sum(), 0, atol=1e-10)
    assert np.isclose((rec_lo**2).sum(), 1.0)


def test_max_level_matches_pywt_formula():
    # pywt.dwt_max_level(256, 16) == 4
    assert dwt_max_level(256, 16) == 4
    assert dwt_max_level(1000, 16) == 6


def test_coefficient_lengths_match_pywt_symmetric(rng):
    x = rng.standard_normal(256)
    coeffs = wavedec(x, 8)
    # pywt symmetric-mode lengths for n=256, db8, level 4.
    assert [len(c) for c in coeffs] == [30, 30, 45, 75, 135]


def test_perfect_reconstruction(rng):
    for n in (64, 100, 256):
        x = rng.standard_normal(n)
        xr = waverec(wavedec(x, 8), 8)
        np.testing.assert_allclose(xr[:n], x, atol=1e-10)


def test_wavelet_denoise_shapes_and_noise_reduction(rng):
    t = np.linspace(0, 4 * np.pi, 256)
    clean = np.sin(t) + 0.5 * np.sin(5 * t)
    noisy = clean + 0.3 * rng.standard_normal(256)
    den = wavelet_denoise(np.stack([noisy, noisy]))
    assert den.shape == (2, 256)
    # 3-D recursion path
    den3 = wavelet_denoise(rng.standard_normal((3, 2, 256)))
    assert den3.shape == (3, 2, 256)
    # Denoising should reduce error vs clean.
    err_noisy = np.mean((noisy - clean) ** 2)
    err_den = np.mean((den[0] - clean) ** 2)
    assert err_den < err_noisy


def test_fft_denoise(rng):
    t = np.linspace(0, 8 * np.pi, 256)
    clean = np.sin(t)
    noisy = clean + 0.05 * rng.standard_normal(256)
    den = fft_denoise(noisy[None])
    assert den.shape == (1, 256)
    assert np.mean((den[0] - clean) ** 2) < np.mean((noisy - clean) ** 2)


def test_tpu_dwt_matches_host_path():
    """The batched conv-pyramid DWT (kernels/dwt_tpu.py) agrees with the
    bit-faithful numpy path to float32 precision."""
    import jax.numpy as jnp
    from ecg_denoise_tpu.kernels.dwt_tpu import wavelet_denoise_tpu

    rng = np.random.default_rng(0)
    x = rng.standard_normal((6, 2, 256))
    host = wavelet_denoise(x)
    tpu = np.asarray(wavelet_denoise_tpu(jnp.asarray(x, jnp.float32)))
    np.testing.assert_allclose(tpu.reshape(host.shape), host, atol=1e-4)
