#!/usr/bin/env python
"""Attribute the per-window forward time of RaleNet('full') (VERDICT r2:
"the headline chip is ~98% idle and nobody knows where the time goes").

Strategy: ablation timing. Each variant monkeypatches ONE primitive out of
the model (attention math -> identity, LeFF partial conv -> identity,
LayerNorm -> identity, PE table -> None) and re-times the identical chained
forward; the delta vs the full model attributes that primitive's wall share.
An isolated-attention microbench times the 20 fused_attention calls alone
at their exact in-model shapes, separating kernel cost from inter-kernel
XLA cost. Timing protocol = bench.py's (chained fori_loop inside one jit,
hard sync via device_get — block_until_ready is not a fence through the
axon tunnel).

Run on the real chip:  python scripts/profile_forward.py --batch 2048
Variants compile cold over the tunnel; use the detached queue wrapper.

Optionally --perfetto tries jax.profiler with a perfetto trace for a
device-level view (may be unsupported through the remote tunnel).
"""

from __future__ import annotations

import argparse
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


# The 20 attention call shapes of RaleNet at L0=256 (models/ralenet.py):
# (L, C, H, n_calls): enc stages depth 2 at (256,8,2) (128,16,4) (64,32,8)
# (32,64,16); bottleneck+ut4: 2+2 at (16,128,32); dec (32,64,16) (64,32,8)
# (128,16,4). Head dim is 4 everywhere.
STAGES = [
    (256, 8, 2, 2), (128, 16, 4, 2), (64, 32, 8, 2), (32, 64, 16, 2),
    (16, 128, 32, 4), (32, 64, 16, 2), (64, 32, 8, 2), (128, 16, 4, 2),
]


def attn_isolated(batch, dtype, iters, chain, use_pallas=True):
    """Time the attention stage shapes alone, chained like the model."""
    import jax
    import jax.numpy as jnp

    from ecg_denoise_tpu.ops.attention import multi_head_attention

    total = 0.0
    per_stage = {}
    for (L, C, H, n) in STAGES:
        D = 4
        key = jax.random.PRNGKey(L)
        q = jax.random.normal(key, (batch, H, L, D), dtype)
        bias = jnp.zeros((1, H, L, L), dtype)

        def one(v):
            return multi_head_attention(v, v, v, bias,
                                        use_pallas=use_pallas).astype(v.dtype)

        dt = timed(one, q, iters, chain)
        per_stage[f"L{L}_H{H}"] = per_stage.get(f"L{L}_H{H}", 0.0) + dt * n
        total += dt * n
    return total, per_stage


def attn_isolated_raw(batch, dtype, iters, chain):
    """Time the raw pallas kernel launches alone, chained on pre-packed
    (B, Hg, D, P*L) operands — NO XLA-side transposes/packs. iso minus
    iso-raw attributes the glue share of each attention call."""
    import jax
    import jax.numpy as jnp

    import ecg_denoise_tpu.kernels.attention_pallas as ap

    total = 0.0
    per_stage = {}
    for (L, C, H, n) in STAGES:
        D = 4
        P = ap._pack_factor(batch, H, L)
        Hp, Lp = H // P, P * L
        key = jax.random.PRNGKey(L)
        q = jax.random.normal(key, (batch, Hp, D, Lp), dtype)
        bias = ap._block_diag_bias(None, H, L, P) if P > 1 else \
            jnp.zeros((H, L, L), jnp.float32)

        def one(v):
            return ap._fwd_call(v, v, v, bias, Hp, Lp).astype(v.dtype)

        dt = timed(one, q, iters, chain)
        per_stage[f"L{L}_H{H}"] = per_stage.get(f"L{L}_H{H}", 0.0) + dt * n
        total += dt * n
    return total, per_stage


def build_fwd(args, patches=()):
    """Return a forward fn with the requested primitives patched out."""
    import jax
    import jax.numpy as jnp

    from ecg_denoise_tpu import ops
    from ecg_denoise_tpu.ops import attention as attn_mod
    from ecg_denoise_tpu.ops import layers as layers_mod
    from ecg_denoise_tpu.models import build_model

    if "attn" in patches:
        def _identity_mha(q, k, v, bias, *, use_pallas=False):
            return q  # (B,H,L,D) passthrough: removes qk/softmax/pv entirely

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
    if "pe" in patches:
        attn_mod.sinusoidal_pe_table = lambda max_len, d: None

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = build_model("ralenet", use_pallas=args.use_pallas, dtype=dtype)
    x = jnp.ones((args.batch, 2, 256), jnp.float32)
    variables = jax.jit(lambda k, s: model.init(k, s, train=False))(
        jax.random.PRNGKey(0), x[:2]
    )

    def fwd(batch):
        return model.apply(variables, batch, train=False).astype(batch.dtype)

    return fwd, x


def reset_modules():
    """Reload the patched modules so each variant starts clean."""
    import importlib

    from ecg_denoise_tpu.ops import attention as attn_mod

    importlib.reload(attn_mod)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--use-pallas", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--variants", default="full,attn,leff,ln,pe,iso,iso-xla")
    ap.add_argument("--perfetto", action="store_true")
    args = ap.parse_args()

    from ecg_denoise_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    wanted = args.variants.split(",")
    out = {"batch": args.batch, "dtype": args.dtype,
           "use_pallas": args.use_pallas, "chain": args.chain}
    us = lambda dt: round(dt * 1e6, 1)

    if "full" in wanted:
        fwd, x = build_fwd(args)
        dt_full = timed(fwd, x, args.iters, args.chain)
        out["full_us"] = us(dt_full)
        out["full_wps"] = round(args.batch / dt_full, 1)
        if args.perfetto:
            import jax

            try:
                with jax.profiler.trace("runs/profile_trace",
                                        create_perfetto_trace=True):
                    jax.device_get(jax.jit(fwd)(x)[:1, :1, :1])
                out["perfetto"] = "runs/profile_trace"
            except Exception as e:  # tunnel may not support device tracing
                out["perfetto_error"] = repr(e)[:200]

    for name in ("attn", "leff", "ln", "pe"):
        if name not in wanted:
            continue
        reset_modules()
        fwd, x = build_fwd(args, patches=(name,))
        dt = timed(fwd, x, args.iters, args.chain)
        out[f"no_{name}_us"] = us(dt)
        reset_modules()

    if "iso" in wanted:
        total, per_stage = attn_isolated(args.batch, args.dtype, args.iters,
                                         args.chain, use_pallas=True)
        out["attn_iso_pallas_us"] = us(total)
        out["attn_iso_pallas_stages_us"] = {k: us(v) for k, v in per_stage.items()}
    if "iso-raw" in wanted:
        total, per_stage = attn_isolated_raw(args.batch, args.dtype,
                                             args.iters, args.chain)
        out["attn_iso_raw_us"] = us(total)
        out["attn_iso_raw_stages_us"] = {k: us(v) for k, v in per_stage.items()}
    if "iso-xla" in wanted:
        total, _ = attn_isolated(args.batch, args.dtype, args.iters,
                                 args.chain, use_pallas=False)
        out["attn_iso_xla_us"] = us(total)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
