#!/usr/bin/env python
"""Calibrate the fused-layer VMEM budget on the real chip.

Sweeps block_pallas._BUDGET_BYTES (which sets the per-stage group size G)
and times apply_fast at the headline config (batch 512, bf16 matmuls).
Mosaic reuses dead buffers, so the static working-set estimate overcounts;
this finds the largest budget that still compiles/runs, and the fastest.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import ecg_denoise_tpu.kernels.block_pallas as bp
from ecg_denoise_tpu.models import build_model
from ecg_denoise_tpu.models.ralenet_fast import apply_fast
from ecg_denoise_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

BATCH = int(os.environ.get("SWEEP_BATCH", 512))
ITERS = 20

model = build_model("ralenet")
x = jnp.ones((BATCH, 2, 256), jnp.float32)
variables = jax.jit(lambda k, s: model.init(k, s, train=False))(
    jax.random.PRNGKey(0), x[:2]
)

budgets_mb = [float(a) for a in sys.argv[1:]] or [8, 16, 24, 48, 96]
for mb in budgets_mb:
    bp._BUDGET_BYTES = int(mb * 1024 * 1024)
    gs = {f"s{i+1}": bp.block_group_size(BATCH, H, L, C, 4 * C)
          for i, (H, L, C) in enumerate(
              [(2, 256, 8), (4, 128, 16), (8, 64, 32), (16, 32, 64), (32, 16, 128)])}

    fwd = jax.jit(lambda b: apply_fast(variables, b, variant="full"))
    try:
        t_c0 = time.time()
        jax.block_until_ready(fwd(x))
        compile_s = time.time() - t_c0
        jax.block_until_ready(fwd(x))
        t0 = time.time()
        for _ in range(ITERS):
            out = fwd(x)
        jax.block_until_ready(out)
        wps = BATCH * ITERS / (time.time() - t0)
        print(f"budget={mb:6.1f}MB G={gs} -> {wps:,.0f} w/s "
              f"(compile {compile_s:.0f}s)", flush=True)
    except Exception as e:  # noqa: BLE001 — sweep survives OOM points
        print(f"budget={mb:6.1f}MB G={gs} -> FAILED: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
    fwd.clear_cache()
