"""SNR-targeted noise mixing.

Reimplements the reference's mixing math (reference:
local_utils/local_utils.py:86-114 `Gnoisegen`, :176-192
`single_snr_noise_add`, :194-215 `batch_ecg_noise_add_snr`) as clean pure
functions, in both numpy (offline cache building) and jax (on-device
augmentation) forms.

Faithfulness notes (documented deviations from reference bugs):
* Reference `Gnoisegen` divides both signal and noise power by `len(x)` of a
  possibly-2D array — the lengths cancel in the scale ratio, so the clean
  energy-ratio formula used here is *mathematically identical*.
* Reference `batch_ecg_noise_add_snr` calls `single_snr_noise_add(data, snr,
  noise)` with swapped args (local_utils.py:210) — a latent bug on a path no
  entry script exercises. We implement the evidently intended behavior
  (noise scaled to hit the target SNR) and do not reproduce the bug.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _noise_scale(signal_energy, noise_energy, snr_db):
    """Scale s.t. mean(signal^2) / mean((s*noise)^2) == 10^(snr/10)."""
    target_noise_energy = signal_energy / (10.0 ** (snr_db / 10.0))
    return np.sqrt(target_noise_energy / noise_energy)


def gnoisegen(x: np.ndarray, y: np.ndarray, snr: float):
    """Scale noise `y` so `x + noise` has the target SNR (dB).

    Returns (noisy, scaled_noise). Matches reference Gnoisegen
    (local_utils.py:86-114) up to the len() quirk that cancels out.
    """
    signal_energy = np.mean(x.astype(np.float64) ** 2)
    noise_energy = np.mean(y.astype(np.float64) ** 2)
    scale = _noise_scale(signal_energy, noise_energy, snr)
    noise = scale * y
    return x + noise, noise


def single_snr_noise_add(data: np.ndarray, noise: np.ndarray, snr: float) -> np.ndarray:
    """Add `noise` to `data`, scaled to a target SNR in dB.

    Matches reference single_snr_noise_add (local_utils.py:176-192).
    """
    signal_energy = np.mean(np.abs(data.astype(np.float64)) ** 2)
    noise_energy = np.mean(np.abs(noise.astype(np.float64)) ** 2)
    scale = _noise_scale(signal_energy, noise_energy, snr)
    return data + scale * noise


def batch_snr_noise_add(
    data: np.ndarray,
    noise_record: np.ndarray,
    snr: float,
    rng: np.random.Generator,
) -> np.ndarray:
    """Per-window SNR-targeted mixing with random noise offsets.

    data: (B, L, C) clean windows; noise_record: (N, C) long noise record.
    Each window gets an independent random slice of the noise record,
    scaled to the target SNR of *that window* (matching the per-sample
    semantics of reference batch_ecg_noise_add_snr, local_utils.py:194-215,
    with the swapped-arg bug fixed — see module docstring).
    """
    B, L, _ = data.shape
    max_start = noise_record.shape[0] - L - 1
    out = np.empty_like(data, dtype=np.float64)
    for i in range(B):
        start = rng.integers(0, max_start)
        out[i] = single_snr_noise_add(data[i], noise_record[start : start + L], snr)
    return out.astype(data.dtype)


# ---------------------------------------------------------------------------
# JAX on-device variant — used for on-the-fly augmentation inside jit.
# ---------------------------------------------------------------------------


def jax_snr_noise_add(
    data: jnp.ndarray,
    noise_record: jnp.ndarray,
    snr: jnp.ndarray | float,
    key: jax.Array,
) -> jnp.ndarray:
    """Vectorised on-device SNR-targeted mixing.

    data: (B, C, L); noise_record: (N, C) resident in HBM. Each batch row
    draws a random offset into the noise record; the slice gather is a
    single dynamic_slice per row under vmap (XLA lowers this to efficient
    gathers), and the energy normalisation fuses with the add.
    """
    B, C, L = data.shape
    n = noise_record.shape[0]
    starts = jax.random.randint(key, (B,), 0, n - L - 1)

    def one(row, start):
        sl = jax.lax.dynamic_slice(noise_record, (start, 0), (L, noise_record.shape[1]))
        noise = sl.T.astype(row.dtype)  # (C, L)
        sig_e = jnp.mean(row**2)
        noi_e = jnp.mean(noise**2)
        scale = jnp.sqrt(sig_e / (10.0 ** (snr / 10.0)) / noi_e)
        return row + scale * noise

    return jax.vmap(one)(data, starts)
