#!/usr/bin/env python
"""Separate per-EXECUTION (tunnel/dispatch) overhead from true per-CALL cost.

Round-3's floor probe (scripts/probe_floor.py) reported a "null pallas_call
launch" of 1.4 ms/call — MORE than a dma-mode call that streams 67 MB
(1.15 ms). Those numbers are only consistent if a large per-execution
overhead E (host dispatch + axon-tunnel round trip, ~tens of ms) is being
amortized over just ITERS*CHAIN = 24 calls:

    measured_per_call = E / (ITERS * CHAIN) + true_per_call

This probe times the same null / dma / full-attention kernels AND the full
RaleNet forward at CHAIN in {8, 64, 256}: per-call cost vs 1/CHAIN is a
line whose intercept is the true per-call cost and whose slope is E.
Consequences: (a) an honest size for the "fewer launches" prize (VERDICT
r3 item 5), (b) whether bench.py's default --chain 8 understates the
sustained headline throughput.

Run on the real chip:  python scripts/probe_chain.py --batch 2048
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


def null_fn():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    def one(v):
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec((8, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(v[0])
        return out[None]

    return one, jnp.ones((1, 8, 128), jnp.float32)


def attn_fn(batch, mode):
    import ecg_denoise_tpu.kernels.attention_pallas as ap

    L, H = 256, 2
    P = ap._pack_factor(batch, H, L)
    Hp, Lp = H // P, P * L
    q = jax.random.normal(jax.random.PRNGKey(0), (batch, Hp, 4, Lp),
                          jnp.bfloat16)
    bias = ap._block_diag_bias(None, H, L, P) if P > 1 else \
        jnp.zeros((H, L, L), jnp.float32)
    if mode:
        os.environ["ECG_ATTN_ABLATE"] = mode
    else:
        os.environ.pop("ECG_ATTN_ABLATE", None)

    def one(v, _m=mode):
        return ap._fwd_call(v, v, v, bias, Hp, Lp).astype(v.dtype)

    return one, q


def model_fn(batch):
    from ecg_denoise_tpu.models import build_model

    model = build_model(4, use_pallas=True, dtype=jnp.bfloat16)
    x = jnp.ones((batch, 2, 256), jnp.bfloat16)
    variables = jax.jit(lambda k, s: model.init(k, s, train=False))(
        jax.random.PRNGKey(0), x[:2])

    def one(v):
        return model.apply(variables, v, train=False).astype(v.dtype)

    return one, x


def main():
    ap_args = argparse.ArgumentParser()
    ap_args.add_argument("--batch", type=int, default=2048)
    ap_args.add_argument("--chains", type=int, nargs="+",
                         default=[8, 64, 256])
    args = ap_args.parse_args()

    cases = [
        ("null", *null_fn()),
        ("attn_dma", *attn_fn(args.batch, "dma")),
        ("attn_full", *attn_fn(args.batch, "")),
        ("model_fwd", *model_fn(args.batch)),
    ]
    print(f"{'case':>10s} " + " ".join(f"K={k:<5d}" for k in args.chains)
          + "   (us/call; intercept=true cost, slope/K=exec overhead)")
    for name, fn, x in cases:
        # re-set ablate env for attn cases at time of trace
        if name == "attn_dma":
            os.environ["ECG_ATTN_ABLATE"] = "dma"
        elif name == "attn_full":
            os.environ.pop("ECG_ATTN_ABLATE", None)
        vals = []
        for k in args.chains:
            try:
                vals.append(timed(fn, x, k))
            except Exception as e:  # noqa: BLE001
                print(f"  [{name} K={k}: {type(e).__name__}: {str(e)[:80]}]")
                vals.append(float("nan"))
        # two-point fit on the extremes: per_call = E/K + c
        k0, k1 = args.chains[0], args.chains[-1]
        v0, v1 = vals[0], vals[-1]
        E = (v0 - v1) / (1.0 / k0 - 1.0 / k1)
        c = v1 - E / k1
        print(f"{name:>10s} " + " ".join(f"{v:7.1f}" for v in vals)
              + f"   true={c:.1f}us  E={E / 1e3:.1f}ms")
    os.environ.pop("ECG_ATTN_ABLATE", None)
    print("CHAIN_PROBE_DONE")


if __name__ == "__main__":
    main()
