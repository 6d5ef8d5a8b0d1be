#!/usr/bin/env python
"""Attribute the training-step time of RaleNet('full') at batch 256 f32
(the measured-fastest trainer: --use_pallas custom-VJP, 25.0k w/s after
the round-3 softmax fold + flash backward).

Same instrument as profile_forward.py — ablation timing — but through the
whole jitted train epoch (fwd + bwd + Adam + BN stats + metrics in one
lax.scan): each variant patches ONE primitive out of the model before
tracing, so its delta attributes that primitive's fwd+bwd wall share.
eval_epoch at the same batch gives the forward-only reference.

Run on the real chip (detached; compiles go through the tunnel):
    python scripts/profile_train.py --batch 256
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_epoch(args, patches=()):
    import jax
    import jax.numpy as jnp

    from ecg_denoise_tpu.ops import attention as attn_mod

    if "attn" in patches:
        def _identity_mha(q, k, v, bias, *, use_pallas=False):
            return q

        attn_mod.multi_head_attention = _identity_mha
    import flax.linen as nn

    if "leff" in patches:
        class _IdConv(nn.Module):
            dim: int = 0
            n_div: int = 0
            dtype: object = jnp.float32

            def __call__(self, x):
                return x

        attn_mod.PartialConv1d = _IdConv
    if "ln" in patches:
        class _IdLN(nn.Module):
            epsilon: float = 1e-5
            dtype: object = jnp.float32

            def __call__(self, x):
                return x

        attn_mod.LayerNorm = _IdLN

    from ecg_denoise_tpu.models import build_model
    from ecg_denoise_tpu.train.state import create_train_state
    from ecg_denoise_tpu.train.steps import make_epoch_fns

    model = build_model("ralenet", use_pallas=args.use_pallas)
    n = args.batch * args.steps
    key = jax.random.PRNGKey(0)
    noisy = jax.random.normal(key, (n, 2, 256), jnp.float32)
    clean = noisy * 0.5
    state, tx = create_train_state(model, jax.random.PRNGKey(0), noisy[:2])
    train_epoch, eval_epoch = make_epoch_fns(model, tx, donate=False)
    return state, train_epoch, eval_epoch, noisy, clean


def reset_modules():
    import importlib

    from ecg_denoise_tpu.ops import attention as attn_mod

    importlib.reload(attn_mod)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=8,
                    help="scan steps per epoch call (chain analogue)")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--use-pallas", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--variants", default="full,attn,leff,ln,eval")
    args = ap.parse_args()

    from ecg_denoise_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    wanted = args.variants.split(",")
    out = {"batch": args.batch, "steps": args.steps,
           "use_pallas": args.use_pallas}

    def time_train(state, train_epoch, noisy, clean):
        key = jax.random.PRNGKey(1)
        st, m = train_epoch(state, noisy, clean, key, args.batch)  # compile
        jax.device_get(m)
        t0 = time.time()
        for i in range(args.iters):
            st, m = train_epoch(st, noisy, clean, jax.random.PRNGKey(i),
                                args.batch)
        jax.device_get(m)
        return (time.time() - t0) / args.iters / args.steps  # s per step

    for name in ("full", "attn", "leff", "ln"):
        if name not in wanted:
            continue
        reset_modules()
        state, train_epoch, eval_epoch, noisy, clean = build_epoch(
            args, patches=() if name == "full" else (name,))
        dt = time_train(state, train_epoch, noisy, clean)
        out[f"{name}_ms_per_step"] = round(dt * 1e3, 3)
        out[f"{name}_wps"] = round(args.batch / dt, 1)

    if "eval" in wanted:
        reset_modules()
        state, train_epoch, eval_epoch, noisy, clean = build_epoch(args)
        m = eval_epoch(state, noisy, clean, args.batch)
        jax.device_get(m)
        t0 = time.time()
        for _ in range(args.iters):
            m = eval_epoch(state, noisy, clean, args.batch)
        jax.device_get(m)
        dt = (time.time() - t0) / args.iters / args.steps
        out["eval_ms_per_step"] = round(dt * 1e3, 3)
        out["eval_wps"] = round(args.batch / dt, 1)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
