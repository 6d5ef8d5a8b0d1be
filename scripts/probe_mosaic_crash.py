"""Bisect the r3k on-chip Mosaic crash (lower_to_llo.cc:1093
`Check failed: d >> 32 == 0 (-1 vs. 0)`, SIGABRT in LLOOpBuilder::cst).

Every grad-containing attention program crashed the tunnel's compile
helper on 2026-08-18 (runs/r3k_tpu_kernel_tests.log), including with
ECG_ATTN_FLASHBWD=0 — while plain forwards (bench default 82.9k w/s)
compiled fine. New since the last green on-chip tier (r3g): the want_s
forward (folded softmax-sum residual output), the o/s residual inputs
to the backward, and the flash backward body. This probe compiles each
suspect in isolation, smallest program first, and prints PASS/CRASH per
stage so the crashing construct is pinned to one kernel feature.

Usage: python scripts/probe_mosaic_crash.py [stage ...]
(default: all stages; each runs in-process until one crashes the
backend — rerun with the remaining stage names to continue past it).
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from ecg_denoise_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

import ecg_denoise_tpu.kernels.attention_pallas as ap

B, H, L, D = 8, 8, 32, 4  # packs P=4 -> Hp=2, Lp=128


def _ops():
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
               for _ in range(3))
    bias = jnp.asarray(rng.standard_normal((1, H, L, L)), jnp.float32)
    return q, k, v, bias


def stage_fwd_plain():
    q, k, v, bias = _ops()
    out = jax.jit(lambda *a: ap._fwd(*a))(q, k, v, bias)
    return float(jnp.sum(out))


def stage_fwd_want_s():
    q, k, v, bias = _ops()

    def f(q, k, v, bias):
        o, s = ap._fwd(q, k, v, bias, want_s=True)
        return jnp.sum(o) + jnp.sum(s)

    return float(jax.jit(f)(q, k, v, bias))


def stage_bwd_classic():
    os.environ["ECG_ATTN_FLASHBWD"] = "0"
    q, k, v, bias = _ops()
    g = jax.jit(jax.grad(
        lambda q, k, v, bias: jnp.sum(ap.fused_attention(q, k, v, bias) ** 2),
        (0, 1, 2, 3)))(q, k, v, bias)
    os.environ.pop("ECG_ATTN_FLASHBWD")
    return float(jnp.sum(g[0]))


def stage_bwd_flash():
    q, k, v, bias = _ops()
    g = jax.jit(jax.grad(
        lambda q, k, v, bias: jnp.sum(ap.fused_attention(q, k, v, bias) ** 2),
        (0, 1, 2, 3)))(q, k, v, bias)
    return float(jnp.sum(g[0]))


def stage_bwd_flash_nobias():
    q, k, v, _ = _ops()
    g = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(ap.fused_attention(q, k, v, None) ** 2),
        (0, 1, 2)))(q, k, v)
    return float(jnp.sum(g[0]))


STAGES = [
    ("fwd_plain", stage_fwd_plain),
    ("fwd_want_s", stage_fwd_want_s),
    ("bwd_classic", stage_bwd_classic),
    ("bwd_flash_nobias", stage_bwd_flash_nobias),
    ("bwd_flash", stage_bwd_flash),
]


def main():
    want = sys.argv[1:]
    for name, fn in STAGES:
        if want and name not in want:
            continue
        print(f"=== {name} ===", flush=True)
        try:
            val = fn()
            print(f"PASS {name}: {val:.6g}", flush=True)
        except Exception as e:  # noqa: BLE001 — crash report is the product
            print(f"CRASH {name}: {type(e).__name__}: {str(e)[:400]}",
                  flush=True)


if __name__ == "__main__":
    main()
