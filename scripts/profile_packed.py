#!/usr/bin/env python
"""Ablation profiler for the WINDOW-PACKED forward (models/ralenet_packed.py)
— the packed-era counterpart of scripts/profile_forward.py.

Each variant monkeypatches ONE packed primitive to identity and re-times
the identical chained forward; deltas vs the full model attribute wall
share. Variants:

  full      the packed forward as shipped
  attn      kernel launches -> passthrough (projections + boundary
            transposes stay): attributes the fused-attention kernels
  attnall   whole _pattn -> identity: adds the qkv/proj matmuls and the
            window<->head packing transposes to the ablation
  ln        segment LayerNorm -> passthrough
  leff      LeFF partial conv -> passthrough
  pe        PE injection table -> zeros

Timing protocol = bench.py's (chained fori_loop in one jit, device_get
hard sync). Run on the real chip:
    python scripts/profile_packed.py --batch 2048
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, x, iters, chain):
    import jax

    @jax.jit
    def run(batch):
        return jax.lax.fori_loop(0, chain, lambda i, v: fn(v), batch)

    jax.block_until_ready(run(x))  # compile
    jax.device_get(run(x)[:1, :1, :1])
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = run(x)
    jax.device_get(out[:1, :1, :1])
    return (time.time() - t0) / iters / chain


def build_fwd(args, patch=None):
    import jax
    import jax.numpy as jnp

    import ecg_denoise_tpu.models.ralenet_packed as rp

    importlib.reload(rp)  # start clean each variant

    if patch == "attn":
        rp._fused_attention_packed = lambda qp, kp, vp, bias, Hp, Lp: qp
        rp._rpos_packed = lambda qp, kp, vp, t, o, W, L, Hp, Lp: qp
    elif patch == "attnall":
        rp._pattn = lambda x, p, bias, H, P, C, mm: x
    elif patch == "ln":
        rp._pln = lambda x, p, P, C, out_dtype: x.astype(out_dtype)
    elif patch == "leff":
        rp._pleff = lambda x, taps, P, hidden: x
    elif patch == "pe":
        rp.sinusoidal_pe_table = (
            lambda max_len, d: jnp.zeros((1, max_len, d), jnp.float32))

    from ecg_denoise_tpu.models import build_model

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = build_model("ralenet")
    x = jnp.ones((args.batch, 2, 256), jnp.float32)
    variables = jax.jit(lambda k, s: model.init(k, s, train=False))(
        jax.random.PRNGKey(0), x[:2])

    def fwd(batch):
        return rp.apply_packed(variables, batch, variant="full",
                               mm_dtype=dtype).astype(batch.dtype)

    return fwd, x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--variants", default="full,attn,attnall,ln,leff,pe")
    args = ap.parse_args()

    from ecg_denoise_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    out = {"batch": args.batch, "dtype": args.dtype, "chain": args.chain}
    us = lambda dt: round(dt * 1e6, 1)
    full_dt = None
    for variant in args.variants.split(","):
        fwd, x = build_fwd(args, None if variant == "full" else variant)
        dt = timed(fwd, x, args.iters, args.chain)
        out[f"{variant}_us"] = us(dt)
        if variant == "full":
            full_dt = dt
            out["full_wps"] = round(args.batch / dt, 1)
        elif full_dt:
            out[f"{variant}_share_us"] = us(full_dt - dt)
        print(json.dumps(out))

    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
