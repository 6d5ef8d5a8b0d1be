#!/usr/bin/env python
"""Downstream-utility benchmark — reference `test_cls.py` equivalent.

Feeds the (frozen) beat classifier with: clean test beats, emb-noised
beats, each available denoiser's reconstruction of the noised beats, and
the DWT / FFT classical baselines; reports accuracy / precision / F1 for
every condition (reference test_cls.py:106-255).

Denoiser checkpoints are discovered under --model_save_dir using the
reference naming scheme ({name}_{epoch}_emb_intensity-4, test_cls.py:78-104);
conditions whose checkpoint is missing are skipped with a notice instead of
crashing.

Example:
    python cli/test_cls.py --cls_ckpt ./model_save/cls_model.msgpack
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from ecg_denoise_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cls_ckpt", type=str, default="./model_save/cls_model.msgpack")
    p.add_argument("--model_save_dir", type=str, default="./model_save")
    p.add_argument("--data_path", type=str, default=None)
    p.add_argument("--noise_name", type=str, default="emb")
    p.add_argument("--intensity", type=int, default=-4)
    p.add_argument("--batch_size", type=int, default=128)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ecg_denoise_tpu.data.cls_cache import load_cls_arrays
    from ecg_denoise_tpu.metrics.cls import accuracy, precision, f1_score
    from ecg_denoise_tpu.models import ResNetCls, build_model, MODEL_NAMES
    from ecg_denoise_tpu.train.state import create_train_state
    from ecg_denoise_tpu.train.cls_steps import make_cls_epoch_fns
    from ecg_denoise_tpu.train.checkpoint import load_checkpoint, find_model

    te_x, te_y = load_cls_arrays(train=False, noised=False, path=args.data_path)
    no_x, _ = load_cls_arrays(train=False, noised=True, path=args.data_path)
    te_x, te_y, no_x = jnp.asarray(te_x), jnp.asarray(te_y), jnp.asarray(no_x)

    cls_model = ResNetCls()
    cls_state, cls_tx = create_train_state(
        cls_model, jax.random.PRNGKey(0), te_x[:2]
    )
    if os.path.exists(args.cls_ckpt):
        cls_state = load_checkpoint(args.cls_ckpt, cls_state)
    else:
        print(f"WARNING: classifier checkpoint {args.cls_ckpt} missing — "
              "using untrained weights (run cli/train_cls.py first)")
    _, eval_epoch = make_cls_epoch_fns(cls_model, cls_tx)

    def report(name, data):
        _, logits = eval_epoch(cls_state, data, te_y, args.batch_size)
        a = float(accuracy(logits, te_y))
        pr = float(precision(logits, te_y))
        f1 = float(f1_score(logits, te_y))
        print(f"{name:24s} acc={a:.4f} precision={pr:.4f} f1={f1:.4f}")

    report("clean", te_x)
    report("noisy", no_x)

    # --- per-denoiser conditions ---
    for name in MODEL_NAMES:
        ckpt_dir = os.path.join(args.model_save_dir, name)
        path = find_model(ckpt_dir, name) if os.path.isdir(ckpt_dir) else None
        if not path:
            print(f"{name:24s} (no checkpoint under {ckpt_dir} — skipped)")
            continue
        dn_model = build_model(name)
        dn_state, _ = create_train_state(dn_model, jax.random.PRNGKey(0), no_x[:2])
        dn_state = load_checkpoint(path, dn_state)
        variables = {"params": dn_state.params, "batch_stats": dn_state.batch_stats}
        denoise = jax.jit(lambda d: dn_model.apply(variables, d, train=False))
        report(name, denoise(no_x))

    # --- classical baselines ---
    from ecg_denoise_tpu.kernels.dwt_tpu import wavelet_denoise_tpu
    from ecg_denoise_tpu.baselines.fft import fft_denoise

    report("dwt", wavelet_denoise_tpu(no_x).astype(jnp.float32))
    report("fft", jnp.asarray(fft_denoise(np.asarray(no_x)), jnp.float32))


if __name__ == "__main__":
    main()
