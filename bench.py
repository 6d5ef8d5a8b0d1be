#!/usr/bin/env python
"""Headline benchmark: RA-LENet (full) denoising throughput, windows/sec/chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline: the reference publishes no throughput numbers (BASELINE.md), so the
north-star comparison is the reference PyTorch model on CPU (BASELINE.json:
">=50x windows/sec/chip vs PyTorch-CPU"). The torch-CPU number below was
measured in this image on 2026-08-19 under quiet conditions (reference
model/transformer.py ralenet, high_level_enhence=True, eval(), no_grad,
batch 32, best of 5): 209.7 windows/sec (the container was rebuilt mid
round 3 and got ~2x faster than the 2026-08-16 measurement of 107;
results/round4/torch_baseline_r4_quiet.log). Re-measure live with
--measure-baseline.

Our measurement: jitted forward (inference path) of
ecg_denoise_tpu.models.RaleNet('full') at batch BATCH on the default JAX
platform (the driver runs this on one real TPU chip), steady-state over
ITERS iterations after warmup. Timing hard-syncs with a host device_get
(block_until_ready is not a reliable fence through this image's remote-TPU
tunnel) and chains --chain forwards inside one jit call so per-call tunnel
transfers don't masquerade as chip time. Default path: the fused-attention
Pallas kernel at batch 2048 (measured fastest; see --use-pallas).
"""

from __future__ import annotations

import argparse
import json
import time

TORCH_CPU_BASELINE_WPS = 209.7  # reference ralenet fwd, CPU, batch 32 (see docstring)
TORCH_CPU_TRAIN_BASELINE_WPS = 84.3  # reference ralenet Adam+MSE step, CPU, batch 32

# Peak dense bf16 FLOP/s per chip, by jax device_kind substring (public
# figures: v4 275, v5e 197, v5p 459, v6e 918 TFLOP/s; v2/v3 have no bf16
# MXU mode beyond their f32 peaks of 22.5/61.5 per core x2).
_PEAK_BF16_TFLOPS = [
    ("v6", 918.0), ("v5p", 459.0), ("v5 lite", 197.0), ("v5e", 197.0),
    ("v5litepod", 197.0), ("v4", 275.0), ("v3", 123.0), ("v2", 45.0),
]


def _peak_tflops(device) -> float | None:
    kind = getattr(device, "device_kind", "").lower()
    for sub, peak in _PEAK_BF16_TFLOPS:
        if sub in kind:
            return peak
    return None


def ralenet_flops_per_window(depth: int = 2, mlp_ratio: float = 4.0) -> float:
    """Analytic forward FLOPs (mul+add = 2) for RaleNet('full') at L=256.

    Used for the fused-Pallas path, whose kernel FLOPs are opaque to XLA's
    cost model. Per TransformerBlock at (N, C): qkv 6NC^2 + proj 2NC^2 +
    full-length attention 4N^2C + MLP 2*2*N*C*(ratio*C); the LeFF partial
    conv touches a 1/hidden channel slice (negligible). Stage dims per
    models/ralenet.py: enc (256,8)(128,16)(64,32)(32,64), bottleneck AND
    utransformer4 both at (16,128), dec (32,64)(64,32)(128,16) — the
    decoder runs at POST-merge dims, so (256,8) appears only once (a naive
    enc*2 mirror over-counted total FLOPs by ~8%). PatchMerging/Separate
    are thin Dense layers.
    """
    def block(n, c):
        return (8 + 4 * mlp_ratio) * n * c * c + 4 * n * n * c

    enc = [(256, 8), (128, 16), (64, 32), (32, 64)]
    dec = [(32, 64), (64, 32), (128, 16)]
    f = 0.0
    for n, c in enc:
        f += depth * block(n, c)
        f += 4 * n * c * c            # PatchMerging Dense(2C->2C) at N/2
        f += 2 * n * c * c            # PatchSeparate Dense(C->C/2) at 2N
    for n, c in dec:
        f += depth * block(n, c)
    f += 2 * depth * block(16, 128)   # bottleneck + utransformer4
    f += 2 * 256 * 3 * 2 * 8 * 2      # conv stem + head (k=3, 2<->8 ch)
    return f


def _roofline_fields(flops_per_call: float | None, calls_per_sec: float,
                     batch: int, *, flop_key: str = "gflops_per_window") -> dict:
    """MFU / roofline summary (VERDICT round-1 item 5: report MFU, not just
    a torch-CPU ratio). `flop_key` distinguishes forward-only counts
    (inference) from fwd+bwd counts (training) so the two records never
    share a field name with different semantics."""
    if not flops_per_call or flops_per_call <= 0:
        return {}
    import jax

    fields = {
        flop_key: round(flops_per_call / batch / 1e9, 4),
        "tflops": round(flops_per_call * calls_per_sec / 1e12, 3),
    }
    peak = _peak_tflops(jax.devices()[0])
    if peak:
        fields["mfu_pct"] = round(100.0 * fields["tflops"] / peak, 2)
    return fields


def _maxfree_guard(model, params, batch_stats, probe, context: str) -> None:
    """Audit the ECG_ATTN_MAXFREE escape hatch on this bench's own workload
    (exactness is conditional on max logit < 60 — VERDICT r4 item 5)."""
    from ecg_denoise_tpu.utils.logit_audit import maxfree_active, run_maxfree_guard

    if not maxfree_active():
        return
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    run_maxfree_guard(model, variables, probe, context=context)


def _load_reference_ralenet():
    import sys
    import types

    tv = types.ModuleType("torchvision")
    tv.ops = types.ModuleType("torchvision.ops")
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.ops", tv.ops)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from model import transformer  # noqa: the reference package

    return transformer.ralenet(high_level_enhence=True)


def measure_torch_baseline(batch: int = 32, iters: int = 5) -> float:
    """Run the reference PyTorch model fwd on CPU (for --measure-baseline)."""
    import torch

    m = _load_reference_ralenet()
    m.eval()
    x = torch.randn(batch, 2, 256)
    with torch.no_grad():
        for _ in range(2):
            m(x)
        t0 = time.time()
        for _ in range(iters):
            m(x)
        dt = (time.time() - t0) / iters
    return batch / dt


def measure_torch_train_baseline(batch: int = 32, iters: int = 5) -> float:
    """Reference PyTorch Adam+MSE training step on CPU, mirroring the
    reference loop (denoise_train.py:24,52-57) — for --train
    --measure-baseline (previously a hardcoded constant; VERDICT r2 weak 7)."""
    import torch
    import torch.nn.functional as F

    m = _load_reference_ralenet()
    m.train()
    opt = torch.optim.Adam(m.parameters(), lr=1e-3)
    x = torch.randn(batch, 2, 256)
    y = x * 0.5

    def step():
        opt.zero_grad()
        loss = F.mse_loss(m(x), y)
        loss.backward()
        opt.step()

    for _ in range(2):
        step()
    t0 = time.time()
    for _ in range(iters):
        step()
    dt = (time.time() - t0) / iters
    return batch / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None,
                    help="default: 2048 inference (throughput plateau) / "
                         "32 training (the reference's batch, for a fair "
                         "baseline)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--repeat", type=int, default=3,
                    help="independent timing repetitions reported as "
                         "min/median/max in the one JSON line (value = "
                         "median). Tunnel dispatch gives single draws a "
                         "±20%% spread at train @256 (23.4-28.0k across "
                         "round-4 sessions), so headlines quote the "
                         "median (the driver's BENCH_r*.json carries the "
                         "spread).")
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--use-pallas", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="fused-attention Pallas kernel inside the XLA "
                         "model — the measured-fastest path BOTH ways "
                         "(fwd 83.0k w/s @2048 vs 35.0k plain XLA; train "
                         "@256: 23.4-28.0k across round-4 sessions — "
                         "run-to-run tunnel variance, quote the --repeat "
                         "median — vs 16.6k XLA). Default: on for BOTH "
                         "since round 5 (the kernel trainer is "
                         "quality-certified: RESULTS.md 100-epoch A/B).")
    # --fast / --packed / --fast-train were the whole-stage fused and
    # window-packed engines — retired round 4 after losing their final
    # A/Bs (40.1k / 77.1k vs the default 83.0k w/s; RESULTS.md "retired
    # engines"). Git history (pre-1654be4) has the code.
    ap.add_argument("--chain", type=int, default=8,
                    help="forwards chained inside ONE jit call via "
                         "lax.fori_loop (output feeds the next input — "
                         "same shapes). Measures steady-state CHIP "
                         "throughput like the --train epoch scan does; "
                         "per-call host<->device transfers through this "
                         "image's remote-TPU tunnel (~240 MB/s) otherwise "
                         "dominate at >=1 MB batches. --chain 1 = the old "
                         "per-dispatch measurement.")
    ap.add_argument("--measure-baseline", action="store_true")
    ap.add_argument("--train", action="store_true",
                    help="measure TRAINING throughput (jitted whole-epoch "
                         "scan: fwd+bwd+Adam+metrics) instead of inference")
    ap.add_argument("--r-pos", default=None, choices=["detect"],
                    help="with --train: per-window detected R-peak biases "
                         "(the paper's namesake feature; round 3 gave it a "
                         "fused-kernel fast path — ops/attention.py RPosBias)")
    args = ap.parse_args()

    if args.batch is None:
        args.batch = 32 if args.train else 2048
    if args.use_pallas is None:
        # Round-5 default flip (VERDICT r4 item 2): the kernel path is the
        # measured-fastest AND quality-certified trainer, so it is the
        # default both ways; --no-use-pallas is the plain-XLA escape.
        args.use_pallas = True

    import jax
    import jax.numpy as jnp

    from ecg_denoise_tpu.models import build_model
    from ecg_denoise_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = build_model("ralenet", use_pallas=args.use_pallas, dtype=dtype)

    if args.train:
        import numpy as _np

        from ecg_denoise_tpu.train.state import create_train_state
        from ecg_denoise_tpu.train.steps import make_epoch_fns

        n = 8192
        bs = min(args.batch, n)  # per-step training batch (reference: 32)
        rng = _np.random.default_rng(0)
        noisy = jnp.asarray(rng.standard_normal((n, 2, 256)), jnp.float32)
        clean = noisy * 0.5
        state, tx = create_train_state(model, jax.random.PRNGKey(0), noisy[:2])
        _maxfree_guard(model, state.params, state.batch_stats, noisy[:bs],
                       "bench-train")
        train_epoch, _ = make_epoch_fns(
            model, tx, donate=False,
            detect_r_pos=args.r_pos == "detect",
        )
        key = jax.random.PRNGKey(1)
        state, m = train_epoch(state, noisy, clean, key, bs)  # compile
        jax.device_get(m)
        epochs = max(args.iters // 5, 1)
        samples = []
        for r in range(args.repeat):
            t0 = time.time()
            for i in range(epochs):
                state, m = train_epoch(state, noisy, clean,
                                       jax.random.PRNGKey(r * epochs + i), bs)
            # device_get, not block_until_ready: a host round-trip of the
            # final metrics is a hard data dependency on the whole epoch
            # chain even if the remote-tunnel backend treats
            # block_until_ready as a no-op.
            jax.device_get(m)
            samples.append(epochs * (n // bs) * bs / (time.time() - t0))
        samples.sort()
        wps = samples[len(samples) // 2]  # median: tunnel-variance robust
        train_baseline = (
            measure_torch_train_baseline() if args.measure_baseline
            else TORCH_CPU_TRAIN_BASELINE_WPS
        )
        flops = 3.0 * ralenet_flops_per_window() * n  # bwd ~= 2x fwd
        print(json.dumps({
            "metric": "ralenet_full_train_throughput",
            **({"r_pos": args.r_pos} if args.r_pos else {}),
            "path": "attn-pallas" if args.use_pallas else "xla",
            "value": round(wps, 1),
            "unit": "windows/sec/chip",
            **({"repeat": args.repeat,
                "min": round(samples[0], 1),
                "max": round(samples[-1], 1)} if args.repeat > 1 else {}),
            "vs_baseline": round(wps / train_baseline, 2),
            **_roofline_fields(flops, wps / n if flops else 0.0, n,
                               flop_key="gflops_per_window_fwd_bwd"),
        }))
        return
    x = jnp.ones((args.batch, 2, 256), jnp.float32)
    # jit the init: eager init dispatches hundreds of tiny ops individually
    # (minutes over the axon tunnel); jitted it is one program.
    variables = jax.jit(lambda k, s: model.init(k, s, train=False))(
        jax.random.PRNGKey(0), x[:2]
    )
    _maxfree_guard(model, variables["params"], variables.get("batch_stats"),
                   x[: min(args.batch, 256)], "bench-fwd")

    def fwd_body(batch):
        # Cast keeps the chained fori_loop carry type stable (a bf16
        # model returns bf16).
        return model.apply(variables, batch, train=False).astype(batch.dtype)

    K = max(args.chain, 1)
    if K > 1:
        # Chain K data-dependent forwards inside one jit call (the model is
        # shape-preserving, so each output feeds the next input): the chip
        # runs K back-to-back forwards per dispatch, amortising the per-call
        # transfer/latency exactly like the --train whole-epoch scan.
        @jax.jit
        def fwd(batch):
            return jax.lax.fori_loop(0, K, lambda i, v: fwd_body(v), batch)
    else:
        fwd = jax.jit(fwd_body)

    jax.block_until_ready(fwd(x))  # compile + warmup
    jax.device_get(fwd(x)[:1, :1, :1])
    samples = []
    for _ in range(args.repeat):
        t0 = time.time()
        for _ in range(args.iters):
            out = fwd(x)
        # Hard sync: host round-trip of a slice of the LAST output
        # (see --train).
        jax.device_get(out[:1, :1, :1])
        samples.append(args.iters * K * args.batch / (time.time() - t0))
    samples.sort()
    wps = samples[len(samples) // 2]
    dt = args.batch / wps

    baseline = (
        measure_torch_baseline() if args.measure_baseline else TORCH_CPU_BASELINE_WPS
    )
    # MFU uses the analytic model-FLOP count for BOTH paths (Pallas custom
    # calls are opaque to XLA's cost model, and the XLA count includes
    # non-matmul elementwise work — measured 97.5 vs 66.5 MFLOP/window).
    flops = ralenet_flops_per_window() * args.batch
    print(
        json.dumps(
            {
                "metric": "ralenet_full_fwd_throughput",
                "path": "attn-pallas" if args.use_pallas else "xla",
                "value": round(wps, 1),
                "unit": "windows/sec/chip",
                **({"repeat": args.repeat,
                    "min": round(samples[0], 1),
                    "max": round(samples[-1], 1)} if args.repeat > 1 else {}),
                "vs_baseline": round(wps / baseline, 2),
                **_roofline_fields(flops, 1.0 / dt, args.batch),
            }
        )
    )


if __name__ == "__main__":
    main()
