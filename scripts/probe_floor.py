"""On-chip probe: what sets the attention kernel's compute-free floor?

The r3c ablation found a 1.7-2.4 ms/stage floor with ALL compute skipped
(ECG_ATTN_ABLATE=dma: the kernel only copies q -> o through VMEM). That
floor is ~2/3 of post-fold attention time (~10 of 15.3 ms at batch 2048),
so its mechanism is the next optimization frontier. Candidates:

  a) per-grid-step fixed cost (DMA issue latency, pipeline bubbles)
     -> time should scale ~linearly with step count at fixed total work
  b) VMEM<->HBM streaming of the blocks themselves
     -> time flat in step count, ~proportional to bytes
  c) harness/launch overhead per pallas_call
     -> flat in BOTH; shrinks only with fewer calls

This sweeps the grid group size G (via ECG_ATTN_VMEM_BUDGET, read at
trace time) for dma-mode and full kernels at two stage shapes, printing
us/call vs steps. Run on the real chip:
    python scripts/probe_floor.py --batch 2048
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

CHAIN = 8
ITERS = 3
STAGES = [(256, 2), (64, 8)]  # (L, H); D=4, packing applies at L=64


def timed(fn, x):
    @jax.jit
    def run(v):
        return jax.lax.fori_loop(0, CHAIN, lambda i, h: fn(h), v)

    jax.block_until_ready(run(x))
    jax.device_get(run(x)[:1, :1, :1])
    t0 = time.time()
    out = None
    for _ in range(ITERS):
        out = run(x)
    jax.device_get(out[:1, :1, :1])
    return (time.time() - t0) / ITERS / CHAIN * 1e6  # us per call


def null_launch_us():
    """Per-call cost of a minimal pallas_call (grid=(1,), one (8, 128)
    VMEM copy): isolates the LAUNCH component of the compute-free floor.
    The r3c per-call cost was ~1.2-1.5 ms at EVERY stage shape — if a
    null launch costs the same, the floor is launch overhead and the fix
    is fewer pallas_calls, not cheaper DMAs."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    x = jnp.ones((1, 8, 128), jnp.float32)

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

    return timed(one, x)


def main():
    ap_args = argparse.ArgumentParser()
    ap_args.add_argument("--batch", type=int, default=2048)
    args = ap_args.parse_args()
    B = args.batch

    import ecg_denoise_tpu.kernels.attention_pallas as ap

    print(f"null pallas_call launch: {null_launch_us():.1f} us/call")

    print(f"{'stage':>9s} {'budget':>8s} {'G':>4s} {'steps':>6s} "
          f"{'dma us':>8s} {'full us':>8s}")
    for (L, H) in STAGES:
        P = ap._pack_factor(B, H, L)
        Hp, Lp = H // P, P * L
        D = 4
        q = jax.random.normal(jax.random.PRNGKey(L), (B, Hp, D, Lp),
                              jnp.bfloat16)
        bias = ap._block_diag_bias(None, H, L, P) if P > 1 else \
            jnp.zeros((H, L, L), jnp.float32)
        for budget in (196608, 393216, 786432, 1572864, 3145728, 6291456):
            os.environ["ECG_ATTN_VMEM_BUDGET"] = str(budget)
            G = ap._group_size(B, Hp, Lp)
            steps = B // G
            row = {}
            for mode in ("dma", ""):
                if mode:
                    os.environ["ECG_ATTN_ABLATE"] = mode
                else:
                    os.environ.pop("ECG_ATTN_ABLATE", None)

                def one(v, _m=mode, _b=budget):
                    # _m/_b pinned so each (mode, budget) traces fresh
                    return ap._fwd_call(v, v, v, bias, Hp, Lp).astype(v.dtype)

                try:
                    row[mode] = timed(one, q)
                except Exception as e:  # noqa: BLE001 — OOM at big G
                    row[mode] = float("nan")
                    print(f"  [budget {budget} mode {mode or 'full'}: "
                          f"{type(e).__name__}: {str(e)[:90]}]")
            # bytes: q,k,v in + o out, (B, Hp, 8-padded D, Lp) bf16 tiles
            mb = 4 * B * Hp * 8 * Lp * 2 / 1e6
            gbs = mb / 1e3 / (row["dma"] / 1e6) if row["dma"] else 0.0
            print(f"L{L:>4d}_H{H:<3d} {budget // 1024:>7d}k {G:>4d} "
                  f"{steps:>6d} {row['dma']:>8.1f} {row['']:>8.1f} "
                  f"{mb:>6.1f}MB {gbs:>6.0f}GB/s")
    os.environ.pop("ECG_ATTN_VMEM_BUDGET", None)


if __name__ == "__main__":
    main()
