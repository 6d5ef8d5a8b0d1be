"""On-chip probe: can block-diagonal K-packing beat per-window Dense?

The round-3 profile (docs/PROFILE_r3.md) leaves ~5-6 ms of the 24.9 ms
batch-2048 forward in Dense-like channel mixing at K=C=8..128 — MXU
row-issue-bound: a K=8 contraction uses 8 of the 128 sublanes of every
issued row. The failed ECG_DENSE_PACK experiment (3.3x slower model,
runs/r3_ab.log) paid a pack/unpack relayout at EVERY Dense boundary; an
end-to-end packed forward would pay only at the attention boundaries (or
none, if the dense K-packed attention kernel ingests the packed layout).
This probe isolates the two terms on hardware:

  1. a square C->C matmul chain at each stage shape, unpacked
     (B*L, C) @ (C, C) vs kron-packed (B*L/P, P*C) @ blockdiag(P x (C, C))
     — bitwise-identical math, P = min(16, 128 // C)
  2. the pack relayout (B, L, C) -> (B/P, L, P*C) and back, in isolation
     (with an elementwise op between so XLA cannot cancel the pair)

Decision rule: build a packed forward only if (1) shows a large win AND
(2) costs little at the ~40 attention boundaries that would remain.

Usage: python scripts/probe_dense_pack.py   (runs on the axon TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from ecg_denoise_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

B = 2048
CHAIN = 64
STAGES = [(256, 8), (128, 16), (64, 32), (32, 64), (16, 128)]
DTYPE = jnp.bfloat16


def run(fn, *args):
    f = jax.jit(fn)
    jax.device_get(f(*args))  # compile + warm
    t0 = time.perf_counter()
    jax.device_get(f(*args))
    return (time.perf_counter() - t0) / CHAIN * 1e6  # us per application


def main():
    rng = np.random.default_rng(0)
    print(f"{'stage':>10s} {'P':>3s} {'unpacked':>10s} {'packed':>10s} "
          f"{'speedup':>8s} {'relayout':>10s}")
    tot_u = tot_p = tot_r = 0.0
    for L, C in STAGES:
        P = min(16, 128 // C) if C < 128 else 1
        W = jnp.asarray(rng.standard_normal((C, C)) * 0.1, DTYPE)
        Wbd = jnp.asarray(
            np.kron(np.eye(P), np.asarray(W, np.float32)), DTYPE)
        xu = jnp.asarray(rng.standard_normal((B * L, C)), DTYPE)
        xp = jnp.asarray(rng.standard_normal((B * L // P, P * C)), DTYPE)
        x3 = jnp.asarray(rng.standard_normal((B, L, C)), DTYPE)

        def chain_mm(w, x):
            return jax.lax.fori_loop(0, CHAIN, lambda i, h: h @ w, x)

        t_u = run(lambda x: chain_mm(W, x), xu)
        t_p = run(lambda x: chain_mm(Wbd, x), xp) if P > 1 else t_u

        def relayout_pair(x):
            # (B, L, C) -> packed (B/P, L, P*C) -> +1 -> back
            def body(i, h):
                hp = (h.reshape(B // P, P, L, C)
                      .transpose(0, 2, 1, 3)
                      .reshape(B // P, L, P * C)) + 1.0
                return (hp.reshape(B // P, L, P, C)
                        .transpose(0, 2, 1, 3)
                        .reshape(B, L, C))
            return jax.lax.fori_loop(0, CHAIN, body, x)

        t_r = run(relayout_pair, x3) if P > 1 else 0.0

        # LayerNorm over each window's C channels, packed segment-reshape
        # formulation vs the unpacked one — decides how a packed forward
        # would normalize (PC lanes -> (P, C) minor split + reduce).
        def ln_unpacked(x):
            def body(i, h):
                hf = h.astype(jnp.float32)
                m = jnp.mean(hf, axis=-1, keepdims=True)
                v = jnp.mean((hf - m) ** 2, axis=-1, keepdims=True)
                return ((hf - m) * jax.lax.rsqrt(v + 1e-5)).astype(h.dtype)
            return jax.lax.fori_loop(0, CHAIN, body, x)

        def ln_packed(x):
            def body(i, h):
                hf = h.astype(jnp.float32).reshape(B * L // P, P, C)
                m = jnp.mean(hf, axis=-1, keepdims=True)
                v = jnp.mean((hf - m) ** 2, axis=-1, keepdims=True)
                y = (hf - m) * jax.lax.rsqrt(v + 1e-5)
                return y.reshape(B * L // P, P * C).astype(h.dtype)
            return jax.lax.fori_loop(0, CHAIN, body, x)

        t_lu = run(ln_unpacked, xu)
        t_lp = run(ln_packed, xp) if P > 1 else t_lu
        tot_u += t_u
        tot_p += t_p
        tot_r += t_r
        print(f"L{L:>4d}_C{C:<4d} {P:>3d} {t_u:>9.1f}u {t_p:>9.1f}u "
              f"{t_u / max(t_p, 1e-9):>7.2f}x {t_r:>9.1f}u "
              f"ln {t_lu:>7.1f}u->{t_lp:>7.1f}u")
    print(f"{'TOTAL':>10s} {'':>3s} {tot_u:>9.1f}u {tot_p:>9.1f}u "
          f"{tot_u / max(tot_p, 1e-9):>7.2f}x {tot_r:>9.1f}u")
    print("(per application at batch 2048; relayout = one pack+unpack "
          "round trip incl. a fused +1; ln = LayerNorm per window)")


if __name__ == "__main__":
    main()
