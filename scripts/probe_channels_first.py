#!/usr/bin/env python
"""Layout probe: is the transformer glue cheaper CHANNELS-FIRST?

Round-4 true attribution (runs/r4g_true_attr.log): attention is ~10.4 ms
of the 24.5 ms true forward; the remaining ~14 ms is XLA glue (LN/Dense/
LeFF/residuals) on (B, L, C) activations whose minor dim C = 8..64 pads
to 128 lanes — up to 16x the logical HBM traffic and 1/16 MXU tile use.
Both round-3 packing engines kept that layout and paid relayouts; this
probes the third option: keep activations (B, C, L) so the TPU tiling
pads nothing (C lands on sublanes, multiples of 8; L >= 128 fills lanes
at the hot early stages) and Dense contracts over the SUBLANE dim via
einsum('bcl,cd->bdl').

Times one residual MLP block y = x + fc2(gelu(fc1(LN(x)))) per layout at
every stage shape, chained inside one jit (chain=64) so tunnel dispatch
amortizes. If channels-first wins decisively at the early stages, a
channels-first forward is the round-4 perf project; if XLA secretly
relayouts (watch for a wash or a loss), the idea dies here for the
committed record.

Run on the real chip:  python scripts/probe_channels_first.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from ecg_denoise_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

ITERS = 3
STAGES = [(256, 8), (128, 16), (64, 32), (32, 64), (16, 128)]  # (L, C)


def timed(fn, x, chain):
    @jax.jit
    def run(v):
        return jax.lax.fori_loop(0, chain, lambda i, h: fn(h), v)

    jax.block_until_ready(run(x))
    jax.device_get(jnp.ravel(run(x))[:1])
    t0 = time.time()
    out = None
    for _ in range(ITERS):
        out = run(x)
    jax.device_get(jnp.ravel(out)[:1])
    return (time.time() - t0) / ITERS / chain * 1e6  # us per call


def ln(x, axis):
    m = jnp.mean(x.astype(jnp.float32), axis=axis, keepdims=True)
    v = jnp.mean(jnp.square(x.astype(jnp.float32) - m), axis=axis,
                 keepdims=True)
    return ((x - m) * jax.lax.rsqrt(v + 1e-5)).astype(x.dtype)


def block_blc(w1, w2):
    # reference layout: (B, L, C), Dense over the minor (lane) dim
    def f(x):
        h = ln(x, -1)
        h = jax.nn.gelu(jnp.einsum("blc,cd->bld", h, w1))
        h = jnp.einsum("bld,dc->blc", h, w2)
        return (x + h).astype(x.dtype)

    return f


def block_bcl(w1, w2):
    # channels-first: (B, C, L), Dense over the SUBLANE dim, L on lanes
    def f(x):
        h = ln(x, 1)
        h = jax.nn.gelu(jnp.einsum("bcl,cd->bdl", h, w1))
        h = jnp.einsum("bdl,dc->bcl", h, w2)
        return (x + h).astype(x.dtype)

    return f


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--chain", type=int, default=64)
    args = p.parse_args()
    B = args.batch

    print(f"{'stage':>12s} {'blc us':>9s} {'bcl us':>9s} {'bcl/blc':>8s}"
          f"   (true us/block-call, chain={args.chain}, batch={B}, bf16)")
    for L, C in STAGES:
        key = jax.random.PRNGKey(C)
        w1 = jax.random.normal(key, (C, 4 * C), jnp.bfloat16) * 0.1
        w2 = jax.random.normal(key, (4 * C, C), jnp.bfloat16) * 0.1
        x_blc = jax.random.normal(key, (B, L, C), jnp.bfloat16)
        x_bcl = jnp.swapaxes(x_blc, 1, 2)
        t_blc = timed(block_blc(w1, w2), x_blc, args.chain)
        t_bcl = timed(block_bcl(w1, w2), x_bcl, args.chain)
        print(f"L{L:>4d}_C{C:<4d} {t_blc:9.1f} {t_bcl:9.1f} "
              f"{t_bcl / t_blc:8.2f}")
    print("CHFIRST_PROBE_DONE")


if __name__ == "__main__":
    main()
