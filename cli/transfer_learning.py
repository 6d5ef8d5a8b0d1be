#!/usr/bin/env python
"""12-lead transfer learning — reference `Transfer_learning.py` equivalent.

Wraps a FROZEN pretrained 2-lead RA-LENet core in trainable 12->2->12 lead
adapters (NewRale) and trains on the 12-lead ExternalData cache with the
standard loop (reference Transfer_learning.py:47-82: full dataset, no 10k
subsample; frozen core via requires_grad=False, ralenet_12leads.py:694-696 —
expressed here as an optax frozen-parameter mask).

The pretrained core checkpoint is discovered under --model_save_dir/ralenet
(reference loads model_save/testmodel_*.pth); --core_ckpt overrides. With no
checkpoint available the core starts from init (a notice is printed) — the
adapters still train, which keeps the path exercisable end-to-end.

Example:
    python cli/transfer_learning.py --epochs 10 --batch_size 32
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from ecg_denoise_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from ecg_denoise_tpu.config import build_argparser, config_from_args

    p = build_argparser(__doc__)
    p.add_argument("--core_ckpt", type=str, default=None)
    p.add_argument("--external_path", type=str, default="./ExternalData/dict_data")
    args = p.parse_args()
    cfg = config_from_args(args)

    import jax
    import jax.numpy as jnp

    from ecg_denoise_tpu.data.dataset import EcgDataset
    from ecg_denoise_tpu.models import NewRale, build_model
    from ecg_denoise_tpu.models.ralenet_12leads import frozen_param_mask
    from ecg_denoise_tpu.train import fit
    from ecg_denoise_tpu.train.state import create_train_state
    from ecg_denoise_tpu.train.checkpoint import load_checkpoint, find_model

    ds = EcgDataset(cfg.noise_name, cfg.noise_intensity, path=args.external_path)
    noisy = ds.data.astype(np.float32)
    clean = ds.ground_data.astype(np.float32)
    # Full dataset (reference Transfer_learning.py:59 — no subsample),
    # deterministic 80/20 split.
    perm = np.random.default_rng(cfg.seed).permutation(len(noisy))
    n_train = int(0.8 * len(noisy))
    tr, te = perm[:n_train], perm[n_train:]

    use_pallas = cfg.use_pallas
    if use_pallas and jax.default_backend() != "tpu":
        print(f"use_pallas: backend is '{jax.default_backend()}', not tpu — "
              "falling back to the plain XLA path")
        use_pallas = False
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    model = NewRale(use_pallas=use_pallas, dtype=dtype)
    sample = jnp.asarray(noisy[:2])
    state, _ = create_train_state(model, jax.random.PRNGKey(cfg.seed), sample)
    mask = frozen_param_mask(state.params)

    # Load the pretrained 2-lead core into the 'rale' subtree.
    core_path = args.core_ckpt or find_model(
        os.path.join(cfg.model_save_dir, "ralenet"), "ralenet"
    )
    core_loaded = False
    if core_path and os.path.exists(core_path):
        core_model = build_model("ralenet")
        core_state, _ = create_train_state(
            core_model, jax.random.PRNGKey(0), jnp.zeros((2, 2, 256), jnp.float32)
        )
        core_state = load_checkpoint(core_path, core_state)
        params = dict(state.params)
        params["rale"] = core_state.params
        batch_stats = dict(state.batch_stats)
        batch_stats["rale"] = core_state.batch_stats
        state = state.replace(params=params, batch_stats=batch_stats)
        core_loaded = True
        print(f"loaded frozen core from {core_path}")
    else:
        print("WARNING: no pretrained ralenet checkpoint found — the frozen "
              "core starts from init (train one with cli/main.py --model_index 4)")

    state, hist = fit(
        model,
        noisy[tr], clean[tr], noisy[te], clean[te],
        epochs=cfg.epochs, batch_size=cfg.batch_size,
        learning_rate=cfg.lr,
        model_name="newrale", noise_name=cfg.noise_name,
        noise_intensity=cfg.noise_intensity, seed=cfg.seed,
        model_save_dir=cfg.model_save_dir, output_file=cfg.output_file,
        frozen_mask=mask,
        init_variables=(state.params, state.batch_stats),
    )
    print(f"final test SNR {hist[1][-1]:.3f} dB")


if __name__ == "__main__":
    main()
