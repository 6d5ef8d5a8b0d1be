"""Inference/serving layer: checkpointed denoisers as jitted callables.

No reference counterpart (its eval is inline in test scripts); built for the
production-serving goal. Design:

* `Denoiser.from_checkpoint` restores a full TrainState checkpoint and
  closes over eval-mode apply.
* Calls are jitted once per padded batch-size bucket (powers of two up to
  `max_batch`) so arbitrary request sizes never trigger recompiles: a
  request of 37 windows runs in the 64-bucket with masked tail, still one
  device dispatch.
* Input/output are numpy (host) arrays; the device round-trip is one H2D
  and one D2H per call.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ecg_denoise_tpu.models import build_model
from ecg_denoise_tpu.train.state import create_train_state
from ecg_denoise_tpu.train.checkpoint import load_variables


def _bucket(n: int, max_batch: int, floor: int = 1) -> int:
    b = floor
    while b < n and b < max_batch:
        b *= 2
    return b


class Denoiser:
    """A servable denoiser: numpy (N, C, L) in -> denoised numpy out.

    The fastest measured serving config is the standard model with
    use_pallas=True (fused attention kernel, everything else XLA). The
    round-2/3 whole-stage-fused (`fast=`) and window-packed (`packed=`)
    engines lost their final A/Bs (40.1k / 77.1k vs 83.0k w/s) and were
    retired in round 4 — RESULTS.md "retired engines"; git pre-1654be4
    has the code.
    """

    def __init__(self, model, variables, max_batch: int = 1024,
                 r_pos: Optional[str] = None, mesh=None,
                 channels: Optional[int] = None):
        self.model = model
        self.variables = variables
        self.max_batch = max_batch
        # Window channel count (12 for newrale) — warmup must compile
        # buckets at the served shape, not a 2-lead default. Derived from
        # the model (models declare in_channels) so a directly-constructed
        # 12-lead Denoiser pre-compiles the right buckets (ADVICE r4).
        self.channels = (channels if channels is not None
                         else getattr(model, "in_channels", 2))
        self._maxfree_audited = False
        import threading

        self._staging = {}  # per-bucket persistent padding buffers
        # One chip, shared staging buffers: serialize calls (the HTTP
        # front-end is threaded).
        self._lock = threading.Lock()

        # Data-parallel serving over a ('data','model') mesh: parameters
        # replicated, request batches sharded on 'data' — jit-SPMD runs
        # each shard on its own chip, gathers on fetch. Collectives ride
        # ICI; no reference counterpart (single-GPU torch). Since round 5
        # the attention-kernel path shards too: the fwd traces inside the
        # mesh context, so the kernels dispatch to their explicit
        # shard_map twins (kernels/attention_pallas.py _data_mesh) —
        # bucket sizes are always multiples of the 'data' axis
        # (_bucket_floor), satisfying the twins' divisibility guard.
        self._bucket_floor = 1
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_data = mesh.shape["data"]
            if n_data & (n_data - 1):
                raise ValueError(f"mesh 'data' size {n_data} must be a "
                                 "power of two (bucket divisibility)")
            from ecg_denoise_tpu.parallel.mesh import replicate_state

            variables = replicate_state(variables, mesh)
            self.variables = variables
            self._bucket_floor = n_data
            self.max_batch = max(max_batch, n_data)
            self._batch_sharding = NamedSharding(mesh, P("data"))
        self.mesh = mesh

        jit_kw = {}
        if mesh is not None:
            jit_kw = dict(in_shardings=(self._batch_sharding,),
                          out_shardings=self._batch_sharding)

        from contextlib import nullcontext

        # The kernel shard_map twins key off the trace-time ambient mesh,
        # so the jitted fwd enters it in-body (active during tracing; a
        # no-op on later cached calls).
        mesh_ctx = (lambda: mesh) if mesh is not None else nullcontext

        if r_pos == "detect":
            # Per-window R-peak-centred attention bias (the paper's
            # namesake feature, +0.16 dB trained quality — RESULTS.md).
            # Round 3 gave it a fused-kernel fast path (RPosBias
            # descriptor), so serving it no longer falls back to the slow
            # materialized-bias path.
            from ecg_denoise_tpu.data.rpeaks import detect_r_peaks

            attn = "+attn-pallas" if getattr(model, "use_pallas", False) else ""
            dp = f"+dp{mesh.shape['data']}" if mesh is not None else ""
            self.inference_path = f"xla{attn}+rpos{dp}:{jax.default_backend()}"

            @partial(jax.jit, **jit_kw)
            def fwd(batch):
                with mesh_ctx():
                    return model.apply(variables, batch, train=False,
                                       r_pos=detect_r_peaks(batch))

        else:
            # Measured fastest serving config on v5e: the model with
            # use_pallas=True (fused-attention kernel, everything else
            # XLA) at large batch — 83.0k windows/s vs 35.0k plain XLA
            # at batch 2048 (RESULTS.md).
            attn = "+attn-pallas" if getattr(model, "use_pallas", False) else ""
            dp = f"+dp{mesh.shape['data']}" if mesh is not None else ""
            self.inference_path = f"xla{attn}{dp}:{jax.default_backend()}"

            @partial(jax.jit, **jit_kw)
            def fwd(batch):
                with mesh_ctx():
                    return model.apply(variables, batch, train=False)

        self._fwd = fwd

    @classmethod
    def from_checkpoint(cls, name_or_index, ckpt_path: str,
                        sample_shape=(2, 2, 256), max_batch: int = 1024,
                        use_pallas: bool = False, dtype=None,
                        r_pos: Optional[str] = None, mesh=None):
        if use_pallas and jax.default_backend() != "tpu":
            # Loud fallback: the attention kernel is a Mosaic (TPU)
            # program.
            print(f"[serving] use_pallas requested but backend is "
                  f"'{jax.default_backend()}' — using the standard XLA path")
            use_pallas = False
        model = build_model(name_or_index, use_pallas=use_pallas,
                            dtype=dtype or jnp.float32)
        state, _ = create_train_state(
            model, jax.random.PRNGKey(0), jnp.zeros(sample_shape, jnp.float32)
        )
        # load_variables (not load_checkpoint): serving never touches the
        # optimizer, and a frozen-mask training run (transfer learning)
        # writes a multi_transform opt_state a plain template can't match.
        variables = load_variables(
            ckpt_path,
            {"params": state.params, "batch_stats": state.batch_stats})
        return cls(model, variables, max_batch,
                   r_pos=r_pos, mesh=mesh, channels=sample_shape[1])

    def __call__(self, x: np.ndarray) -> np.ndarray:
        return self.denoise_timed(x)[0]

    def denoise_timed(self, x: np.ndarray):
        """Denoise + per-segment host timing breakdown (ms).

        Segments: pad (bucket copy), dispatch (H2D + enqueue — returns as
        soon as the async call is in flight), fetch (block for compute +
        D2H; through the remote-TPU tunnel this includes the tunnel round
        trip, which host timing cannot split further).
        """
        import time

        x = np.asarray(x, np.float32)
        squeeze = x.ndim == 2
        if squeeze:
            x = x[None]
        n = x.shape[0]
        out = np.empty_like(x)
        t = {"pad_ms": 0.0, "dispatch_ms": 0.0, "fetch_ms": 0.0}
        with self._lock:
            self._audit_maxfree(x)
            self._denoise_into(x, out, n, t)
        t = {k: round(v, 3) for k, v in t.items()}
        return (out[0] if squeeze else out), t

    def _audit_maxfree(self, x) -> None:
        """Guard the ECG_ATTN_MAXFREE escape hatch on the FIRST real batch.

        The maxfree kernel is exact only below pre-softmax logit 60
        (kernels/attention_pallas.py _MAXFREE_CAP) and the trained
        flagship checkpoint violates it (191.5 — results/round4/
        logit_max_full.log), so when the knob is on, the first served
        batch is audited (one extra jitted forward) and the request is
        REFUSED above the cap unless ECG_ATTN_MAXFREE_FORCE=1
        (VERDICT r4 item 5). Real request data, not a synthetic probe:
        logits are input-dependent and a random probe is only a lower
        bound."""
        # getattr: test doubles subclass Denoiser without running __init__.
        if getattr(self, "_maxfree_audited", False):
            return
        from ecg_denoise_tpu.utils.logit_audit import (
            maxfree_active,
            run_maxfree_guard,
        )

        if maxfree_active():
            n_probe = getattr(self, "_bucket_floor", 1) * 8
            run_maxfree_guard(self.model, self.variables,
                              jnp.asarray(x[:n_probe], jnp.float32),
                              context="serving")
        self._maxfree_audited = True

    def _denoise_into(self, x, out, n, t):
        import time

        i = 0
        while i < n:
            chunk = x[i : i + self.max_batch]
            m = chunk.shape[0]
            b = _bucket(m, self.max_batch, self._bucket_floor)
            t0 = time.perf_counter()
            if m == b:
                padded = chunk  # full bucket: no copy at all
            else:
                # Persistent per-bucket staging buffer: zero once, reuse
                # (only the tail beyond m may hold stale data from a larger
                # previous request — rezero just that slice).
                padded = self._staging.get(b)
                if padded is None or padded.shape[1:] != x.shape[1:]:
                    padded = np.zeros((b, *x.shape[1:]), np.float32)
                    self._staging[b] = padded
                else:
                    padded[m:] = 0.0
                padded[:m] = chunk
            t1 = time.perf_counter()
            y_dev = self._fwd(padded)  # jit handles H2D; async dispatch
            t2 = time.perf_counter()
            np.copyto(out[i : i + m], np.asarray(y_dev)[:m])  # sync point
            t3 = time.perf_counter()
            t["pad_ms"] += (t1 - t0) * 1e3
            t["dispatch_ms"] += (t2 - t1) * 1e3
            t["fetch_ms"] += (t3 - t2) * 1e3
            i += m

    def denoise_record(self, signal: np.ndarray, stride: int = 128,
                       length: int = 256) -> np.ndarray:
        """Denoise an arbitrary-length record by overlap-add stitching.

        The models operate on fixed `length`-sample windows (the reference
        evaluates windows only and has no long-record path). This slides a
        window every `stride` samples (plus a final flush at T-length so
        the tail is always covered), batch-denoises all windows through
        the bucketed jitted path, and blends overlaps with a Hann taper
        normalised by the accumulated weight — window-seam discontinuities
        average out instead of clicking. Positions covered by a single
        window (the record edges) reproduce that window's output exactly.

        signal: (C, T) with C = the model's channel count (2 for the
        reference families). Records shorter than `length` are
        reflect-padded, denoised as one window, and cropped. Returns the
        same shape.
        """
        sig = np.asarray(signal, np.float32)
        if sig.ndim != 2:
            raise ValueError(f"denoise_record wants (C, T), got {sig.shape}")
        c, t = sig.shape
        if t < length:
            pad = length - t
            padded = np.pad(sig, ((0, 0), (0, pad)), mode="reflect"
                            if t > 1 else "edge")
            return self(padded[None])[0][:, :t]
        if stride < 1 or stride > length:
            raise ValueError(f"stride must be in 1..{length}, got {stride}")
        starts = list(range(0, t - length + 1, stride))
        if starts[-1] != t - length:
            starts.append(t - length)
        windows = np.stack([sig[:, s:s + length] for s in starts])
        denoised = self(windows)
        # Hann + eps floor: interior seams blend smoothly; at positions
        # only one window covers, num/den reduces to that window's value.
        w = (np.hanning(length) + 1e-6).astype(np.float32)
        num = np.zeros((c, t), np.float32)
        den = np.zeros((t,), np.float32)
        for s, y in zip(starts, denoised):
            num[:, s:s + length] += w * y
            den[s:s + length] += w
        return num / den

    def streaming(self, stride: int = 128, length: int = 256):
        """A stateful online denoiser over this Denoiser (live monitors)."""
        return StreamingDenoiser(self, stride=stride, length=length)

    def warmup(self, channels: Optional[int] = None, length: int = 256,
               limit: Optional[int] = None) -> None:
        """Pre-compile batch buckets up to `limit` (default: max_batch).

        The limit is rounded UP to the next bucket, so a request of exactly
        `limit` windows never hits a cold compile. `channels` defaults to
        the served model's channel count (12 for newrale).
        """
        # `is None`, not `or`: an explicit channels=0 should error on the
        # zeros() below, not silently fall back to the default (ADVICE r4).
        channels = self.channels if channels is None else channels
        limit = min(_bucket(limit or self.max_batch, self.max_batch,
                            self._bucket_floor),
                    self.max_batch)
        b = self._bucket_floor
        while b <= limit:
            jax.block_until_ready(
                self._fwd(jnp.zeros((b, channels, length), jnp.float32))
            )
            b *= 2


class StreamingDenoiser:
    """Online (live-feed) denoising with bounded latency.

    Wraps a Denoiser for sample streams: `push` accepts any number of new
    samples and returns the samples whose denoising is FINAL — every
    window that can cover them has been accumulated — so output never
    changes retroactively. Latency is at most `length` samples (one model
    window); steady-state it is `length - stride` plus the wait for the
    next window boundary.

    The window placement and Hann-taper overlap-add are EXACTLY
    denoise_record's: feeding a whole record through push()+flush() in
    chunks of any size reproduces denoise_record(record) (same window
    starts incl. the tail flush, same weights), modulo float re-batching
    noise. No reference counterpart (its eval is fixed windows only).
    """

    def __init__(self, denoiser: Denoiser, stride: int = 128,
                 length: int = 256):
        if stride < 1 or stride > length:
            raise ValueError(f"stride must be in 1..{length}, got {stride}")
        self.denoiser = denoiser
        self.stride = stride
        self.length = length
        self._w = (np.hanning(length) + 1e-6).astype(np.float32)
        self._buf = None      # (C, n) inputs from self._anchor onward
        self._num = None      # weighted-output accumulator, same span
        self._den = None
        self._anchor = 0      # absolute sample index of buf[:, 0]
        self._next_start = 0  # absolute start of the next grid window
        self._emitted = 0     # absolute index of the first unemitted sample
        self._total = 0       # absolute samples received
        self._flushed = False

    def push(self, samples: np.ndarray) -> np.ndarray:
        """Feed (C, k) new samples; return (C, m) finalized denoised
        samples (m can be 0 while the first window fills)."""
        if self._flushed:
            raise RuntimeError("stream already flushed")
        x = np.asarray(samples, np.float32)
        if x.ndim != 2:
            raise ValueError(f"push wants (C, k), got {x.shape}")
        if self._buf is None:
            self._buf = np.zeros((x.shape[0], 0), np.float32)
            self._num = np.zeros((x.shape[0], 0), np.float32)
            self._den = np.zeros((0,), np.float32)
        self._buf = np.concatenate([self._buf, x], axis=1)
        self._num = np.concatenate(
            [self._num, np.zeros_like(x)], axis=1)
        self._den = np.concatenate(
            [self._den, np.zeros((x.shape[1],), np.float32)])
        self._total += x.shape[1]

        starts = []
        while self._next_start + self.length <= self._total:
            starts.append(self._next_start)
            self._next_start += self.stride
        if starts:
            self._accumulate(starts)
            # Positions below the last processed start are final: every
            # later window begins at or after it. Emit BEFORE re-anchoring
            # (emit reads positions below the new anchor).
            out = self._emit(starts[-1])
            self._anchor_to(starts[-1])
            return out
        return self._buf[:, :0]

    def flush(self) -> np.ndarray:
        """End of stream: process the tail-flush window (denoise_record's
        final start at T-length, if off the stride grid) and return every
        remaining sample. Short streams (< one window) reflect-pad like
        denoise_record."""
        if self._flushed:
            raise RuntimeError("stream already flushed")
        self._flushed = True
        if self._buf is None or self._total == 0:
            return np.zeros((0, 0), np.float32)
        t = self._total
        if t < self.length:
            # Same path as denoise_record's short-record branch.
            return self.denoiser.denoise_record(
                self._buf, stride=self.stride, length=self.length)
        last_grid = self._next_start - self.stride
        if t - self.length > last_grid or last_grid < 0:
            self._accumulate([t - self.length])
        return self._emit(t)

    def _accumulate(self, starts) -> None:
        a = self._anchor
        windows = np.stack(
            [self._buf[:, s - a:s - a + self.length] for s in starts])
        outs = self.denoiser(windows)
        for s, y in zip(starts, outs):
            self._num[:, s - a:s - a + self.length] += self._w * y
            self._den[s - a:s - a + self.length] += self._w

    def _anchor_to(self, new_anchor: int) -> None:
        # Drop state below the new anchor; everything below is either
        # emitted already or about to be (emit never reads below it).
        drop = new_anchor - self._anchor
        if drop > 0:
            self._buf = self._buf[:, drop:]
            self._num = self._num[:, drop:]
            self._den = self._den[drop:]
            self._anchor = new_anchor

    def _emit(self, upto: int) -> np.ndarray:
        a = self._anchor
        lo, hi = self._emitted - a, upto - a
        if hi <= lo:
            return self._buf[:, :0]
        out = self._num[:, lo:hi] / self._den[lo:hi]
        self._emitted = upto
        return out
