#!/usr/bin/env python
"""Classical DWT-baseline evaluation — reference `dwt_dn.py` equivalent.

Same dataset/split as cli/main.py (reference dwt_dn.py:20-54 — identical
seed-2023 subsample), runs db8 soft-threshold wavelet denoising over the
test split, and appends mean RMSE/SNR to dwt_dn_result.txt
(reference dwt_dn.py:59-75).

Runs the batched TPU path by default (kernels/dwt_tpu.py lowers the DWT to
batched convolutions); --host falls back to the bit-faithful numpy path.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from ecg_denoise_tpu.config import build_argparser, config_from_args
from ecg_denoise_tpu.data.dataset import load_split_arrays
from ecg_denoise_tpu.metrics import SNR, RMSE


def main():
    from ecg_denoise_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    p = build_argparser(__doc__)
    p.add_argument("--host", action="store_true", help="numpy reference path")
    p.add_argument("--result_file", type=str, default="./dwt_dn_result.txt")
    args = p.parse_args()
    cfg = config_from_args(args)

    _, _, te_n, te_c = load_split_arrays(
        cfg.noise_name, cfg.noise_intensity, path=cfg.data_path,
        n_select=cfg.n_select, seed=cfg.seed,
    )

    if args.host:
        from ecg_denoise_tpu.baselines.dwt import wavelet_denoise

        den = wavelet_denoise(te_n.astype(np.float64))
    else:
        import jax.numpy as jnp
        from ecg_denoise_tpu.kernels.dwt_tpu import wavelet_denoise_tpu

        den = np.asarray(wavelet_denoise_tpu(jnp.asarray(te_n)))

    import jax.numpy as jnp

    snr = float(np.mean(np.asarray(SNR(jnp.asarray(te_c), jnp.asarray(den, jnp.float32)))))
    rmse = float(np.mean(np.asarray(RMSE(jnp.asarray(te_c), jnp.asarray(den, jnp.float32)))))
    line = f"dwt_{cfg.noise_name}_intensity{cfg.noise_intensity}: snr:{snr}, rmse:{rmse}"
    print(line)
    with open(args.result_file, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
