"""Beat-classification (N vs V) cache builder + loader.

The reference's downstream-utility benchmark consumes pre-built caches at
data/cls_data/{N,V}_{train,test}_data.npy plus noised_* variants
(reference train_cls.py:17-37, test_cls.py:32-57), whose builder script is
absent from the repo. This module reconstructs it:

* beat windows come from real MIT-BIH annotations when PhysioNet files are
  present (wfdb_io), else from the synthetic generator's N/V morphologies
  (synth.synth_beat_windows);
* per-window z-normalisation matches the dict_data pipeline;
* the noised_* variants mix combined bw+ma+em ('emb') noise at −4 dB — the
  condition whose denoiser checkpoints test_cls loads
  (reference test_cls.py:78-104: *_99_emb_intensity-4.pth).

Loader returns whole (data, label) arrays — labels 0 = N, 1 = V, N first
(matching the reference's concatenate order, train_cls.py:20-21) — ready
for a single device_put.
"""

from __future__ import annotations

import os

import numpy as np

from ecg_denoise_tpu.data import synth
from ecg_denoise_tpu.data.noise import gnoisegen

FILES = {
    (False, True): ("N_train_data.npy", "V_train_data.npy"),
    (False, False): ("N_test_data.npy", "V_test_data.npy"),
    (True, True): ("noised_N_train_data.npy", "noised_V_train_data.npy"),
    (True, False): ("noised_N_test_data.npy", "noised_V_test_data.npy"),
}


def _znorm_windows(x: np.ndarray) -> np.ndarray:
    """Per-window, per-channel z-norm over the length axis of (N, C, L)."""
    m = x.mean(axis=-1, keepdims=True)
    s = x.std(axis=-1, keepdims=True)
    return (x - m) / np.where(s > 0, s, 1.0)


def build_cls_data(
    out_dir: str,
    n_train: int = 2048,
    n_test: int = 512,
    seed: int = 2023,
    noise_snr_db: float = -4.0,
) -> dict:
    """Build the cls_data cache (synthetic N/V beats + emb-noised copies)."""
    rng = np.random.default_rng(seed)
    noises = {k: synth.synth_noise_record(k, seed + 1000, length=200_000)
              for k in ("bw", "ma", "em")}
    emb = sum(noises.values())

    os.makedirs(out_dir, exist_ok=True)
    counts = {}
    for train, n_windows in ((True, n_train), (False, n_test)):
        for ki, kind in enumerate(("N", "V")):
            clean = _znorm_windows(
                synth.synth_beat_windows(kind, n_windows, seed + 10 * train + ki)
            ).astype(np.float32)
            noisy = np.empty_like(clean)
            L = clean.shape[-1]
            for i in range(n_windows):
                o = rng.integers(0, emb.shape[0] - L - 1)
                sl = emb[o : o + L].T  # (C, L)
                noisy[i] = gnoisegen(clean[i], sl, noise_snr_db)[0]
            cf, nf = FILES[(False, train)][ki], FILES[(True, train)][ki]
            np.save(os.path.join(out_dir, cf), clean)
            np.save(os.path.join(out_dir, nf), noisy)
            counts[cf] = n_windows
    return {"out_dir": out_dir, **counts}


def load_cls_arrays(train: bool = True, noised: bool = False, path: str | None = None):
    """Return (data (N, 2, 256) float32, label (N,) int32), N beats first.

    Same directory fallbacks as the dict_data loader
    (./data/cls_data -> ../data/cls_data).
    """
    if path is None:
        for cand in ("./data/cls_data", "../data/cls_data"):
            if os.path.isdir(cand):
                path = cand
                break
    if path is None or not os.path.isdir(path):
        raise FileNotFoundError(
            "cls_data cache not found; build it with `python cli/build_data.py "
            "--cls` (see ecg_denoise_tpu.data.cls_cache)"
        )
    nf, vf = FILES[(noised, train)]
    n_data = np.load(os.path.join(path, nf)).astype(np.float32)
    v_data = np.load(os.path.join(path, vf)).astype(np.float32)
    data = np.concatenate([n_data, v_data], axis=0)
    label = np.concatenate(
        [np.zeros(len(n_data), np.int32), np.ones(len(v_data), np.int32)]
    )
    return data, label
