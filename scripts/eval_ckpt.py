#!/usr/bin/env python
"""Eval-only: restore a trained checkpoint and report test-set SNR/RMSE.

The measurement tool behind inference-parity gates for kernel knobs (e.g.
ECG_ATTN_MAXFREE): train once, then run this twice with the knob off/on —
identical test_snr means the knob is output-exact on a trained model even
if its training dynamics differ (the round-3 maxfree trained A/B outcome).

    python scripts/eval_ckpt.py --model_index 4 --noise_type_index 3 \
        --intensity_index 0 [--ckpt path.msgpack]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from ecg_denoise_tpu.config import build_argparser, config_from_args
from ecg_denoise_tpu.data.dataset import load_split_arrays
from ecg_denoise_tpu.models import build_model
from ecg_denoise_tpu.train import create_train_state, load_checkpoint, find_model, make_epoch_fns


def main():
    from ecg_denoise_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    parser = build_argparser(__doc__)
    parser.add_argument("--ckpt", type=str, default=None,
                        help="checkpoint path (default: latest for the model)")
    args = parser.parse_args()
    cfg = config_from_args(args)

    _, _, te_n, te_c = load_split_arrays(
        cfg.noise_name, cfg.noise_intensity, path=cfg.data_path,
        n_select=cfg.n_select, seed=cfg.seed, split_file=cfg.split_file,
    )
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    model = build_model(cfg.model_index, use_pallas=cfg.use_pallas, dtype=dtype)
    state, tx = create_train_state(
        model, jax.random.PRNGKey(cfg.seed), jnp.asarray(te_n[:2]),
        learning_rate=cfg.lr,
    )
    path = args.ckpt or find_model(
        os.path.join(cfg.model_save_dir, cfg.model_name), cfg.model_name)
    if path is None:
        sys.exit(f"no checkpoint found for {cfg.model_name} under "
                 f"{cfg.model_save_dir}")
    state = load_checkpoint(path, state)
    _, eval_epoch = make_epoch_fns(model, tx)
    m = eval_epoch(state, jnp.asarray(te_n), jnp.asarray(te_c),
                   cfg.batch_size)
    print(f"EVAL ckpt={path} maxfree={os.environ.get('ECG_ATTN_MAXFREE', '0')} "
          f"use_pallas={cfg.use_pallas} "
          f"test_snr={float(m['snr']):.5f} test_rmse={float(m['rmse']):.5f}")


if __name__ == "__main__":
    main()
