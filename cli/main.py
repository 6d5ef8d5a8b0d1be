#!/usr/bin/env python
"""Denoiser-training dispatcher — reference `main.py` equivalent.

Same flags and behavior (reference main.py:24-87): seed 2023, pick
(noise_type, intensity, model) by index, 10k-window subsample, 80/20 split,
Adam/MSE training, checkpoints + output.txt result line. TPU-native:
device-resident data, one jitted scan per epoch.

Example:
    python cli/main.py --model_index 4 --noise_type_index 3 --intensity_index 0
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from ecg_denoise_tpu.config import build_argparser, config_from_args
from ecg_denoise_tpu.data.dataset import load_split_arrays
from ecg_denoise_tpu.models import build_model
from ecg_denoise_tpu.train import fit


def main():
    from ecg_denoise_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    args = build_argparser(__doc__).parse_args()
    cfg = config_from_args(args)
    for k, v in vars(args).items():
        print(k, v)

    distributed = False
    if cfg.multihost:
        # Must run BEFORE any other jax call so the global device view
        # (all hosts' chips) is what make_mesh sees; no-op on one process.
        from ecg_denoise_tpu.parallel import multihost

        distributed = multihost.initialize()
        print(f"multihost: distributed={'on' if distributed else 'off (single process)'}")

    tr_n, tr_c, te_n, te_c = load_split_arrays(
        cfg.noise_name, cfg.noise_intensity, path=cfg.data_path,
        n_select=cfg.n_select, seed=cfg.seed, split_file=cfg.split_file,
    )
    if distributed:
        # Per-host feeding: keep only this process's strided window shard;
        # fit() reassembles the global batch via make_array_from_process_
        # local_data (train/loop.py), so no host holds the full arrays.
        from ecg_denoise_tpu.parallel import multihost

        tr_n, tr_c = multihost.process_shard(tr_n, tr_c)
        te_n, te_c = multihost.process_shard(te_n, te_c)
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    use_pallas = cfg.use_pallas
    if use_pallas:
        import jax

        if jax.default_backend() != "tpu":
            # Loud fallback: Mosaic kernels only lower for TPU; on other
            # backends they would run in the (slow) interpreter. Tests and
            # the driver dryrun use interpret mode deliberately — the
            # training CLI should not.
            print(f"use_pallas: backend is '{jax.default_backend()}', not "
                  "tpu — falling back to the plain XLA path")
            use_pallas = False
    model = build_model(cfg.model_index, use_pallas=use_pallas, dtype=dtype)

    mesh = None
    if cfg.n_data or cfg.n_model > 1 or distributed:
        from ecg_denoise_tpu.parallel import make_mesh

        mesh = make_mesh(cfg.n_data, cfg.n_model)

    # RaleNet-family-only knob: fall back LOUDLY rather than crash
    # (r_pos would reach a model whose __call__ has no r_pos parameter).
    _RALE = {"ralenet", "ralenet_mlp", "ralenet_nra"}
    r_pos_mode = cfg.r_pos
    if r_pos_mode and cfg.model_name not in _RALE:
        print(f"--r_pos is RaleNet-family only; ignored for {cfg.model_name}")
        r_pos_mode = None

    from ecg_denoise_tpu.utils.run_log import train_log

    # Run-record decoration, the reference's @train_log() equivalent
    # (reference denoise_train.py:14).
    train_log()(fit)(
        model, tr_n, tr_c, te_n, te_c,
        epochs=cfg.epochs, batch_size=cfg.batch_size, learning_rate=cfg.lr,
        model_name=cfg.model_name, noise_name=cfg.noise_name,
        noise_intensity=cfg.noise_intensity, seed=cfg.seed,
        model_save_dir=cfg.model_save_dir, output_file=cfg.output_file,
        mesh=mesh, r_pos_mode=r_pos_mode,
    )


if __name__ == "__main__":
    main()
