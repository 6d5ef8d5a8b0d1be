#!/usr/bin/env python
"""TRUE per-call attention attribution, all stages x ablate modes.

Round-3's per-stage ablation (docs/PROFILE_r3.md section 5) timed at
chain=8, so every number carried ~E/24 of tunnel-dispatch overhead
(E ~= 10 ms; scripts/probe_chain.py round 4). This re-runs the same
ablations at chain=256 where the dispatch term is ~40 us/call — the
printed numbers are (to ~6%) the true on-chip cost of each kernel phase:

    full - noqk  = qk matmul cost
    full - nosm  = softmax (exp [+ max tree unless maxfree]) cost
    full - nopv  = pv matmul (+ fold divide) cost
    dma          = streaming/launch floor
    maxfree      = full with ECG_ATTN_MAXFREE=1 (exp cap, no max tree)

Run on the real chip:  python scripts/probe_true_attr.py --batch 2048
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
STAGES = [(256, 2), (128, 4), (64, 8), (32, 16), (16, 32)]
MODES = ["dma", "noqk", "nosm", "nopv", "", "maxfree"]


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


def stage_case(batch, L, H):
    import ecg_denoise_tpu.kernels.attention_pallas as ap

    P = ap._pack_factor(batch, H, L)
    Hp, Lp = H // P, P * L
    q = jax.random.normal(jax.random.PRNGKey(0), (batch, Hp, 4, Lp),
                          jnp.bfloat16)
    bias = ap._block_diag_bias(None, H, L, P) if P > 1 else \
        jnp.zeros((H, L, L), jnp.float32)

    def one(v):
        return ap._fwd_call(v, v, v, bias, Hp, Lp).astype(v.dtype)

    return one, q


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--chain", type=int, default=256)
    args = p.parse_args()

    print(f"{'stage':>10s} " + " ".join(f"{m or 'full':>8s}" for m in MODES)
          + "   (us/call true, chain=%d)" % args.chain)
    for L, H in STAGES:
        vals = []
        for m in MODES:
            if m == "maxfree":
                os.environ.pop("ECG_ATTN_ABLATE", None)
                os.environ["ECG_ATTN_MAXFREE"] = "1"
            elif m:
                os.environ["ECG_ATTN_ABLATE"] = m
                os.environ.pop("ECG_ATTN_MAXFREE", None)
            else:
                os.environ.pop("ECG_ATTN_ABLATE", None)
                os.environ.pop("ECG_ATTN_MAXFREE", None)
            fn, x = stage_case(args.batch, L, H)
            try:
                vals.append(timed(fn, x, args.chain))
            except Exception as e:  # noqa: BLE001
                print(f"  [L{L}_H{H} {m}: {type(e).__name__}: {str(e)[:70]}]")
                vals.append(float("nan"))
        print(f"L{L:>4d}_H{H:<3d} " + " ".join(f"{v:8.1f}" for v in vals))
    os.environ.pop("ECG_ATTN_ABLATE", None)
    os.environ.pop("ECG_ATTN_MAXFREE", None)
    print("TRUE_ATTR_DONE")


if __name__ == "__main__":
    main()
