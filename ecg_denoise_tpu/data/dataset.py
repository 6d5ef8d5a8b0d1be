"""Dataset loading + deterministic subsample/split.

Equivalent of the reference's `Ecg_Dataset` (reference:
local_utils/data_utils.py:88-117) plus the sampling/split logic from its
dispatcher (reference: main.py:50-60): 10,000 windows sampled with seed 2023,
then an 80/20 random split.

TPU-first design: instead of a map-style dataset + per-batch host collation
(the torch pattern), `load_split_arrays` returns whole train/test splits as
contiguous numpy arrays. The training loop puts them on device *once* and
`lax.scan`s over batches — the MIT-BIH working set (10k x 2 x 256 float32 =
~20 MB) trivially fits in HBM, so the per-step H2D transfer the reference
pays (denoise_train.py:47-49) is eliminated entirely.
"""

from __future__ import annotations

import os
import random

import numpy as np

INTENSITY_DIRS = {-4: "m4", -2: "m2", 0: "0", 2: "p2", 4: "p4"}


class EcgDataset:
    """Loads the dict_data cache; same layout/fallbacks as the reference.

    noise_name: str or list of str in {'bw','ma','em','emb'};
    noise_intensity: int in {-4,-2,0,2,4}; path: cache dir override
    (reference falls back ./data/dict_data -> ../data/dict_data).
    """

    def __init__(self, noise_name="bw", noise_intensity=0, path: str | None = None):
        if isinstance(noise_name, str):
            noise_name = [noise_name]
        if noise_intensity not in INTENSITY_DIRS:
            raise ValueError("noise intensity should be in [-4, -2, 0, 2, 4]")
        if path is None:
            for cand in ("./data/dict_data/", "../data/dict_data/"):
                if os.path.exists(cand):
                    path = cand
                    break
        if path is None or not os.path.exists(path):
            raise FileNotFoundError(
                "dict_data cache not found; build it with "
                "`python cli/build_data.py` (see ecg_denoise_tpu.data.cache)"
            )
        data = [
            np.load(os.path.join(path, INTENSITY_DIRS[noise_intensity], n + ".npy"))
            for n in noise_name
        ]
        self.data = np.concatenate(data, axis=0)
        ground = np.load(os.path.join(path, "ecg.npy"))
        # Tile the clean windows to stay index-aligned with the k-fold
        # noisy concatenation (the reference never tiles — its list API is
        # latently misaligned for len(noise_name) > 1).
        if len(noise_name) > 1:
            ground = np.tile(ground, (len(noise_name), 1, 1))
        self.ground_data = ground

    def __len__(self):
        return self.data.shape[0]

    def __getitem__(self, index):
        return self.data[index], self.ground_data[index]


def sample_and_split(
    n_total: int, n_select: int = 10_000, train_ratio: float = 0.8, seed: int = 2023
):
    """Deterministic subsample + split, mirroring main.py:52-58.

    Uses python `random` with the reference's seed for the subsample (the
    reference's `random.sample(range(N), 10000)`), then a seeded numpy
    permutation for the 80/20 split (the reference used torch.random_split,
    whose RNG stream we do not reproduce — the *procedure* and determinism
    are preserved).
    """
    n_select = min(n_select, n_total)
    rnd = random.Random()
    rnd.seed(seed)
    selected = rnd.sample(range(n_total), n_select)
    perm = np.random.default_rng(seed).permutation(n_select)
    n_train = int(train_ratio * n_select)
    sel = np.asarray(selected)
    return sel[perm[:n_train]], sel[perm[n_train:]]


def resolve_split(
    n_total: int,
    n_select: int = 10_000,
    seed: int = 2023,
    split_file: str | None = None,
):
    """Train/test indices, optionally pinned to an explicit file.

    `split_file` (JSON {"train": [...], "test": [...]}) makes runs
    parity-comparable across frameworks despite the reference's
    unreproducible torch.random_split RNG stream (reference main.py:54-58):
    if the file exists its indices are used verbatim; otherwise the
    deterministic sample_and_split result is computed and SAVED there, so
    the reference side of a parity experiment can consume the exact split.
    """
    import json

    if split_file and os.path.exists(split_file):
        with open(split_file) as f:
            d = json.load(f)
        tr, te = np.asarray(d["train"], np.int64), np.asarray(d["test"], np.int64)
        both = np.concatenate([tr, te])
        if both.size and (both.min() < 0 or both.max() >= n_total):
            raise ValueError(
                f"split file {split_file} holds out-of-range indices for "
                f"this dataset ({n_total} windows) — built for a different "
                f"cache?"
            )
        return tr, te
    tr, te = sample_and_split(n_total, n_select, seed=seed)
    if split_file:
        os.makedirs(os.path.dirname(os.path.abspath(split_file)), exist_ok=True)
        with open(split_file, "w") as f:
            json.dump({"train": tr.tolist(), "test": te.tolist()}, f)
    return tr, te


def load_split_arrays(
    noise_name="bw",
    noise_intensity=0,
    path: str | None = None,
    n_select: int = 10_000,
    seed: int = 2023,
    split_file: str | None = None,
):
    """Return (train_noisy, train_clean, test_noisy, test_clean) float32 arrays.

    Shapes: (N_train, 2, 256) etc. Ready for single jax.device_put.
    """
    ds = EcgDataset(noise_name, noise_intensity, path)
    tr_idx, te_idx = resolve_split(len(ds), n_select, seed=seed, split_file=split_file)
    noisy = ds.data.astype(np.float32)
    clean = ds.ground_data.astype(np.float32)
    return noisy[tr_idx], clean[tr_idx], noisy[te_idx], clean[te_idx]
