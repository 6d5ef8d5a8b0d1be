"""RaleNet window-packed inference: the whole forward in a lane-packed layout.

`apply_packed(variables, x, variant=...)` reproduces `RaleNet.apply(...,
train=False)` on the same variables tree, but carries the activations as
(B/P, L, P*C) — P = 128//C windows packed side-by-side in the lane (minor)
dimension — from the conv stem to the conv head.

Why (round-3 profile, docs/PROFILE_r3.md): at RA-LENet's channel widths
(C = 8..128, reference model/transformer.py:560-667) XLA's TPU layouts pad
the minor dim to 128 lanes, so the unpacked model moves up to 16x the
logical bytes through HBM and uses C/128 of every MXU tile in both the
contraction and output dims — the measured non-attention forward runs at
~8% MFU. The earlier per-layer experiment (ops/layers.py Dense.lane_pack)
proved the tile-economics win is real but was eaten by HBM lane-shuffle
relayouts at EVERY Dense boundary (3.3x slower model). This module removes
those boundaries: the layout is packed ONCE after the stem and unpacked
ONCE before the head, and every op in between is expressed so it never
leaves the packed layout:

* Dense layers: block-diagonal kron(I_P, W) weights — exact math up to
  summation-order rounding (the off-block zeros cannot perturb any
  partial sum; only the reduction-tree pairing of the C real terms
  changes, ~ulp scale), full 128-lane tiles.
* LayerNorm over C: segment mean/variance via one matmul against
  kron(I_P, ones(C,C)/C) — no reshape, no lane shuffle.
* PatchMerging / PatchSeparate (reference transformer.py:412-460): the
  window-count/batch-row exchange is ONE contiguous-dims transpose per
  stage boundary (10 total across the net), and the channel
  re-arrangements are constant 0/1 scatter/selector matmuls, so the
  packing order stays canonical (row r holds windows [r*P, (r+1)*P)) at
  every stage — an invariant both batch-row exchanges preserve.
* LeFF partial conv (one channel per window, reference
  transformer.py:16-59,144): computed on ALL lanes via two sublane shifts
  (pad + slice) and blended with a constant lane mask.
* Attention: the fused Pallas kernel's pre-packed interface
  (kernels/attention_pallas._fused_attention_packed / _rpos_packed)
  ingests a (B, H/Ph, D, Ph*L) head-packed layout; one fused 6D transpose
  each way converts between window-packing and head-packing at the ~40
  attention boundaries (same traffic as the unpacked model's projection
  transposes).

Weight layout is the standard RaleNet.init tree — trained checkpoints
drop in unchanged.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ecg_denoise_tpu.kernels.attention_pallas import (
    _block_diag_bias,
    _fused_attention_packed,
    _pack_factor,
    _pack_toep,
    _rpos_packed,
)
from ecg_denoise_tpu.models.ralenet_fast import (
    _bn_eval,
    _bn_train,
    _conv1d,
    _rwbias,
)
from ecg_denoise_tpu.ops.attention import sinusoidal_pe_table
from ecg_denoise_tpu.ops.layers import _precision

_CHANNELS = [2 ** (i + 3) for i in range(5)]  # 8..128
_HEADS = [2 ** (i + 1) for i in range(5)]  # 2..32
_LENGTHS = [2 ** (8 - i) for i in range(5)]  # 256..16
_WINDOWS = [32, 16, 8, 4]
_LANES = 128  # TPU lane width: every stage packs P = 128//C windows

_HIGH = jax.lax.Precision.HIGHEST


def _pw(C: int) -> int:
    return _LANES // C


# --- trace-time constant matrices (tiny; built in numpy, cached) -------------


@functools.lru_cache(maxsize=None)
def _ln_avg(P: int, C: int) -> np.ndarray:
    """(P*C, P*C) segment-averaging matrix: kron(I_P, ones(C,C)/C)."""
    return np.kron(np.eye(P, dtype=np.float32),
                   np.full((C, C), 1.0 / C, np.float32))


@functools.lru_cache(maxsize=None)
def _merge_scatter(P: int, C: int):
    """S0/S1 (P*C, P*2C): scatter the even/odd-length halves' channels into
    per-window [even C | odd C] segments (PatchMerging's channel concat)."""
    s0 = np.zeros((P * C, P * 2 * C), np.float32)
    s1 = np.zeros_like(s0)
    w = np.repeat(np.arange(P), C)
    c = np.tile(np.arange(C), P)
    rows = np.arange(P * C)
    s0[rows, w * 2 * C + c] = 1.0
    s1[rows, w * 2 * C + C + c] = 1.0
    return s0, s1


@functools.lru_cache(maxsize=None)
def _half_selectors(P: int, C: int):
    """Sa/Sb (P*C, P*(C/2)): select each window's first/second channel half
    in canonical packed order (PatchSeparate's channel split)."""
    half = C // 2
    sa = np.zeros((P * C, P * half), np.float32)
    sb = np.zeros_like(sa)
    w = np.repeat(np.arange(P), half)
    c = np.tile(np.arange(half), P)
    cols = np.arange(P * half)
    sa[w * C + c, cols] = 1.0
    sb[w * C + half + c, cols] = 1.0
    return sa, sb


@functools.lru_cache(maxsize=None)
def _leff_mask(P: int, hidden: int) -> np.ndarray:
    """(P*hidden,) 1.0 on each window's convolved channel (channel 0: the
    reference's n_div == hidden PartialConv convolves exactly one)."""
    return (np.arange(P * hidden) % hidden == 0).astype(np.float32)


# --- packed primitives --------------------------------------------------------


def _pmat(x, W, b, P, mm_dtype):
    """x (R, L, P*Cin) @ kron(I_P, W(Cin, Cout)) + tiled bias.

    Matches the per-window Dense up to summation-order rounding (x*0.0
    off-block terms are exact zeros; only the reduction-tree pairing of
    the Cin real terms changes — ulp scale); tile economics change.
    """
    Wp = jnp.kron(jnp.eye(P, dtype=jnp.float32), W).astype(mm_dtype)
    y = jnp.dot(x.astype(mm_dtype), Wp, precision=_precision(mm_dtype))
    if b is not None:
        y = y + jnp.tile(b, P).astype(mm_dtype)
    return y


def _ln_precision():
    """ECG_PACKED_LN=high runs the segment-LN stats matmuls as bf16x3
    (3 MXU passes, ~2e-4 relative) instead of HIGHEST (6 passes, f32-
    exact) — an on-chip A/B knob; read at trace time."""
    import os

    if os.environ.get("ECG_PACKED_LN", "") == "high":
        return jax.lax.Precision.HIGH
    return _HIGH


def _pmat3(x, Ws, bs, P, mm_dtype):
    """Fused multi-head Dense: x @ [kron(I_P, W) for W in Ws], columnwise.

    One matmul reads x once for all projections; each output block is
    its projection's packed result at contiguous lane offsets (NOT
    kron(I, concat(Ws)), which would interleave per segment).
    """
    eye = jnp.eye(P, dtype=jnp.float32)
    Wp = jnp.concatenate([jnp.kron(eye, W) for W in Ws],
                         axis=1).astype(mm_dtype)
    b = jnp.concatenate([jnp.tile(b_, P) for b_ in bs]).astype(mm_dtype)
    return jnp.dot(x.astype(mm_dtype), Wp,
                   precision=_precision(mm_dtype)) + b


def _pln(x, p, P, C, out_dtype):
    """Segment LayerNorm over each C-lane window slot (torch eps 1e-5).

    mean/var ride a matmul against the block-diagonal averaging matrix —
    the only cross-lane op — at HIGHEST (default; see _ln_precision) so
    f32 stays f32 on the MXU.
    """
    prec = _ln_precision()
    xf = x.astype(jnp.float32)
    A = jnp.asarray(_ln_avg(P, C))
    mean = jnp.dot(xf, A, precision=prec)
    d = xf - mean
    var = jnp.dot(d * d, A, precision=prec)
    y = d * jax.lax.rsqrt(var + 1e-5) * jnp.tile(p["scale"], P) \
        + jnp.tile(p["bias"], P)
    return y.astype(out_dtype)


def _pmerge(x, p, P, C, mm_dtype):
    """Packed PatchMerging: (R, L, P*C) -> (2R, L/2, (P/2)*2C).

    Even/odd interleave (reference transformer.py:426-460) via sublane
    slices; channel concat via the constant scatter pair; then LN +
    Dense(2C->2C, no bias); finally the batch-row exchange (windows
    [0, P/2) -> row 2r, [P/2, P) -> row 2r+1 — exactly the lane halves,
    so one contiguous reshape/transpose preserves canonical order).
    """
    R, L, _ = x.shape
    s0, s1 = _merge_scatter(P, C)
    prec = _precision(mm_dtype)
    x0 = x[:, 0::2, :].astype(mm_dtype)
    x1 = x[:, 1::2, :].astype(mm_dtype)
    z = jnp.dot(x0, jnp.asarray(s0, mm_dtype), precision=prec) \
        + jnp.dot(x1, jnp.asarray(s1, mm_dtype), precision=prec)
    z = _pln(z, p["norm"], P, 2 * C, mm_dtype)
    z = _pmat(z, p["reduction"]["kernel"], None, P, mm_dtype)
    # batch-row exchange: halve windows-per-row, double rows.
    z = z.reshape(R, L // 2, 2, (P // 2) * 2 * C)
    return z.transpose(0, 2, 1, 3).reshape(2 * R, L // 2, (P // 2) * 2 * C)


def _psep(x, p, P, C, mm_dtype):
    """Packed PatchSeparate: (R, L, P*C) -> (R/2, 2L, 2P*(C/2)).

    Batch-row exchange first (rows 2r, 2r+1 -> row r, segments
    [j*P + w]); then the reference's channel-half CONCATENATION along
    length (transformer.py:412-424, not PatchMerging's inverse — quirk
    preserved) via the constant selector pair; then LN + Dense(C/2->C/2).
    """
    R, L, _ = x.shape
    x = x.reshape(R // 2, 2, L, P * C).transpose(0, 2, 1, 3)
    x = x.reshape(R // 2, L, 2 * P * C)
    P2, half = 2 * P, C // 2
    sa, sb = _half_selectors(P2, C)
    prec = _precision(mm_dtype)
    xm = x.astype(mm_dtype)
    xa = jnp.dot(xm, jnp.asarray(sa, mm_dtype), precision=prec)
    xb = jnp.dot(xm, jnp.asarray(sb, mm_dtype), precision=prec)
    y = jnp.concatenate([xa, xb], axis=1)  # (R/2, 2L, P2*half)
    y = _pln(y, p["norm"], P2, half, mm_dtype)
    return _pmat(y, p["reduction"]["kernel"], None, P2, mm_dtype)


def _pleff(x, taps, P, hidden):
    """Packed LeFF partial conv: k=3 cross-correlation over L on each
    window's channel 0, pass-through elsewhere. Shifts are sublane
    pad+slice (no lane movement); the blend is a constant lane mask."""
    taps = taps.reshape(3).astype(x.dtype)
    xm = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    conv = taps[0] * xm[:, :-2] + taps[1] * xm[:, 1:-1] + taps[2] * xm[:, 2:]
    mask = jnp.asarray(_leff_mask(P, hidden))[None, None, :].astype(x.dtype)
    return x + mask * (conv - x)


def _pattn(x, p, bias, H, P, C, mm_dtype):
    """Packed MSAttention: block-diag projections in the window-packed
    layout, fused Pallas kernel on the head-packed layout, one fused 6D
    transpose at each boundary.

    `bias`: None, (1, H, L, L) static bias, or an (toep, offsets, W)
    tuple for per-window R-peak biases (ops/attention.py RPosBias
    semantics).
    """
    R, L, lanes = x.shape
    D = C // H
    scale = D ** -0.5
    qkv = p["qkv_proj"]
    Wkv, bkv = qkv["to_kv"]["kernel"], qkv["to_kv"]["bias"]
    # One fused q/k/v matmul: x is read once and the three packed weight
    # blocks ride one (P*C, 3*P*C) kernel — [kron(I,Wq) | kron(I,Wk) |
    # kron(I,Wv)] columnwise, so the splits below are contiguous lane
    # slices, each exactly the per-projection packed output.
    y = _pmat3(x, (qkv["to_q"]["kernel"], Wkv[:, :C], Wkv[:, C:]),
               (qkv["to_q"]["bias"], bkv[:C], bkv[C:]), P, mm_dtype)
    PC = P * C
    q2 = y[..., :PC] * jnp.asarray(scale, mm_dtype)
    k2 = y[..., PC:2 * PC]
    v2 = y[..., 2 * PC:]

    B = R * P
    Ph = _pack_factor(B, H, L)  # head-packing factor (kernel-side)
    Hp, Lp = H // Ph, Ph * L

    def to_kernel(a):  # (R, L, P*H*D) -> (B, Hp, D, Ph*L)
        a6 = a.reshape(R, L, P, Hp, Ph, D).transpose(0, 2, 3, 5, 4, 1)
        return a6.reshape(B, Hp, D, Lp)

    qp, kp, vp = to_kernel(q2), to_kernel(k2), to_kernel(v2)
    if isinstance(bias, tuple):  # per-window R-peak bias
        toep, offsets, W = bias
        toep_bd = _pack_toep(toep, H, L, Ph)
        off = offsets.reshape(B, 1, 1).astype(jnp.float32)
        out = _rpos_packed(qp, kp, vp, toep_bd, off, W, L, Hp, Lp)
    else:
        bias_bd = _block_diag_bias(
            bias.reshape(H, L, L) if bias is not None else None, H, L, Ph)
        out = _fused_attention_packed(qp, kp, vp, bias_bd, Hp, Lp)
    o2 = (out.reshape(R, P, Hp, D, Ph, L)
          .transpose(0, 5, 1, 2, 4, 3)
          .reshape(R, L, lanes))
    return _pmat(o2, p["proj"]["kernel"], p["proj"]["bias"], P, mm_dtype)


def _pblock(h, p, pe_t, bias, H, P, C, mm_dtype, local_enhence):
    """Packed TransformerBlock (reference transformer.py:325-411): PE
    re-injection inside the attention branch, pre-norm, LeFF/plain MLP."""
    shortcut = h
    a = h * jnp.asarray(math.sqrt(C), h.dtype) + pe_t.astype(h.dtype)
    a = _pln(a, p["norm1"], P, C, mm_dtype)
    a = _pattn(a, p["attn"], bias, H, P, C, mm_dtype)
    h = shortcut + a

    gelu = functools.partial(jax.nn.gelu, approximate=False)
    hidden = 4 * C  # mlp_ratio = 4 (reference default)
    m = _pln(h, p["norm2"], P, C, mm_dtype)
    m = _pmat(m, p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"]["bias"], P,
              mm_dtype)
    m = gelu(m)
    if local_enhence:
        taps = p["mlp"]["leconv"]["partial_conv3"]["kernel"]
        # The reference re-GELUs the WHOLE tensor after the partial conv
        # (pass-through channels get gelu twice — transformer.py:150-156).
        m = gelu(_pleff(m, taps, P, hidden))
    m = _pmat(m, p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"]["bias"], P,
              mm_dtype)
    return h + m


def _players(h, p, pe_t, bias, H, P, C, mm_dtype, local_enhence):
    names = sorted((k for k in p if k.startswith("blocks_")),
                   key=lambda k: int(k.split("_")[1]))
    for n in names:
        h = _pblock(h, p[n], pe_t, bias, H, P, C, mm_dtype, local_enhence)
    return h


def _toep_from_table(table, W, L):
    """(2W-1, H) table -> (1, H, L, L) Toeplitz expansion (zero for
    |l-m| >= W) — the batch-independent factor of the per-window bias
    (ops/attention.py RelativePositionEmbedding per-window branch)."""
    pos = jnp.arange(L)
    rel = pos[:, None] - pos[None, :]
    idx = jnp.clip(rel + W - 1, 0, 2 * W - 2)
    toep = jnp.asarray(table)[idx] * (jnp.abs(rel) < W)[..., None]
    return toep.transpose(2, 0, 1)[None].astype(jnp.float32)


def _packed_body(params, stem, variant, r_pos, mm_dtype):
    """Shared packed encoder/bottleneck/decoder/head given the stem
    activations (B, 8, 256). Returns the denoised (B, 2, 256)."""
    local_enhence = variant in ("nra", "full")
    use_bias = variant in ("mlp", "full")
    B = stem.shape[0]
    P0 = _pw(_CHANNELS[0])
    if B % P0:
        raise ValueError(f"apply_packed needs batch % {P0} == 0, got {B}")

    # Per-stage attention biases (reference transformer.py:576-579,625-628).
    attn = [None] * 4
    if use_bias:
        for i in range(4):
            W, L, Hh = _WINDOWS[i], _LENGTHS[i], _HEADS[i]
            table = params[f"rwattn{i + 1}"]["relative_position_bias_table"]
            if r_pos is None or jnp.ndim(r_pos) == 0:
                rp = None if r_pos is None else r_pos // (2 ** i)
                attn[i] = _rwbias(params[f"rwattn{i + 1}"], W, L, Hh,
                                  rp)[None]  # (1, H, L, L)
            else:  # per-window R peaks: unmaterialized (toep, offsets, W)
                rp = r_pos // (2 ** i)
                attn[i] = (_toep_from_table(table, W, L),
                           (rp - W // 2).astype(jnp.float32), W)

    def pe_for(L, C, P):
        pe = sinusoidal_pe_table(1000, C)[0, :L, :]  # (L, C) f32
        return jnp.tile(pe, (1, P))

    # pack: (B, L, C) -> (B/P0, L, P0*C), row r = windows [r*P0, (r+1)*P0).
    hb = stem.transpose(0, 2, 1)  # (B, 256, 8)
    h = (hb.reshape(B // P0, P0, _LENGTHS[0], _CHANNELS[0])
         .transpose(0, 2, 1, 3)
         .reshape(B // P0, _LENGTHS[0], P0 * _CHANNELS[0])
         .astype(mm_dtype))  # packed residual stream rides in compute dtype

    skips = []
    for i in range(4):
        C, L, Hh, P = _CHANNELS[i], _LENGTHS[i], _HEADS[i], _pw(_CHANNELS[i])
        h = _players(h, params[f"dtransformer{i + 1}"], pe_for(L, C, P),
                     attn[i], Hh, P, C, mm_dtype, local_enhence)
        h = _pmerge(h, params[f"pm{i + 1}"], P, C, mm_dtype)
        skips.append(h)

    C, L, Hh, P = _CHANNELS[4], _LENGTHS[4], _HEADS[4], _pw(_CHANNELS[4])
    h = _players(skips[3], params["transformer"], pe_for(L, C, P), None,
                 Hh, P, C, mm_dtype, local_enhence) + skips[3]

    dec_masks = [None, attn[3], attn[2], attn[1]]
    for j, i in enumerate(range(4, 0, -1)):
        C, L, Hh, P = _CHANNELS[i], _LENGTHS[i], _HEADS[i], _pw(_CHANNELS[i])
        h = _players(h, params[f"utransformer{i}"], pe_for(L, C, P),
                     dec_masks[j], Hh, P, C, mm_dtype, local_enhence)
        h = _psep(h, params[f"ps{i}"], P, C, mm_dtype)
        if i > 1:
            h = h + skips[i - 2]

    # unpack: (B/P0, L, P0*C) -> (B, L, C) -> (B, C, L)
    h = (h.reshape(B // P0, _LENGTHS[0], P0, _CHANNELS[0])
         .transpose(0, 2, 1, 3)
         .reshape(B, _LENGTHS[0], _CHANNELS[0]))
    h = h.transpose(0, 2, 1).astype(jnp.float32) + stem
    return _conv1d(h, params["transconv"], padding=1)


def apply_packed(variables, x, variant: str = "full",
                 r_pos: Optional[jnp.ndarray] = None,
                 mm_dtype=jnp.bfloat16):
    """Eval-mode RaleNet forward in the window-packed layout. x: (B, 2, 256),
    B divisible by 16 (the stage-0 packing factor).

    mm_dtype: matmul/activation compute dtype (f32 accumulation on every
    matmul either way); bfloat16 is the MXU fast path. Differentiable
    end-to-end (constant selectors + the kernels' custom VJPs).
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    h = _conv1d(x, params["conv1_conv"], padding=1)
    h = jax.nn.leaky_relu(h, negative_slope=0.2)
    stem = _bn_eval(h, params["conv1_bn"], stats["conv1_bn"])  # (B, 8, 256)
    return _packed_body(params, stem, variant, r_pos, mm_dtype)


def _bn_train_sync(x, p, s, axis_name, momentum=0.1, eps=1e-5):
    """Cross-shard (sync-BN) train-mode BatchNorm1d: the SAME two-pass
    global mean/variance a single device computes over the full batch —
    pmean of per-shard means, then pmean of per-shard squared deviations
    from the GLOBAL mean (exact for equal shard sizes). Running stats use
    the unbiased variance at the GLOBAL count (torch convention), so a
    data-parallel step reproduces the single-device step."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 2))
    mean = jax.lax.pmean(mean, axis_name)
    var = jnp.mean((xf - mean[None, :, None]) ** 2, axis=(0, 2))
    var = jax.lax.pmean(var, axis_name)
    n = (x.shape[0] * x.shape[2]) * jax.lax.psum(1.0, axis_name)
    unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
    new_stats = {
        "mean": (1 - momentum) * s["mean"] + momentum * mean,
        "var": (1 - momentum) * s["var"] + momentum * unbiased,
    }
    inv = jax.lax.rsqrt(var + eps) * p["scale"]
    y = (xf - mean[None, :, None]) * inv[None, :, None] \
        + p["bias"][None, :, None]
    return y, new_stats


def apply_packed_train(variables, x, variant: str = "full",
                       r_pos: Optional[jnp.ndarray] = None,
                       mm_dtype=jnp.float32,
                       bn_axis: Optional[str] = None):
    """TRAIN-mode packed forward: same semantics as RaleNet.apply(...,
    train=True, mutable=['batch_stats']) — train-mode stem BatchNorm with
    running-stat updates — with the whole transformer stack in the packed
    layout. Returns (y, new_batch_stats). Fully differentiable (block-diag
    matmul VJPs stay block-diagonal; the attention kernels carry their
    flash-style custom VJPs).

    bn_axis: shard_map axis name for data-parallel training — the stem
    BatchNorm then computes GLOBAL batch statistics across shards
    (sync-BN), so DP steps match single-device steps exactly.
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    h = _conv1d(x, params["conv1_conv"], padding=1)
    h = jax.nn.leaky_relu(h, negative_slope=0.2)
    if bn_axis is None:
        stem, bn_stats = _bn_train(h, params["conv1_bn"], stats["conv1_bn"])
    else:
        stem, bn_stats = _bn_train_sync(h, params["conv1_bn"],
                                        stats["conv1_bn"], bn_axis)
    y = _packed_body(params, stem, variant, r_pos, mm_dtype)
    return y, {"conv1_bn": bn_stats}


def apply_packed_newrale(variables, x, variant: str = "full",
                         mm_dtype=jnp.bfloat16):
    """Eval-mode NewRale (12-lead) forward with the pretrained core in the
    window-packed layout (models/ralenet_12leads.py semantics: 12->6->2
    adapter convs, frozen core with eval-mode BN, 2->6->12 expansion;
    reference model/ralenet_12leads.py:680-709). x: (B, 12, L), B % 16 == 0.
    """
    p = variables["params"]
    s = variables.get("batch_stats", {})

    def lrelu(h):
        return jax.nn.leaky_relu(h, negative_slope=0.01)

    def conv(h, name, pad=6):
        q = p[name]
        y = jax.lax.conv_general_dilated(
            h, q["kernel"], (1,), [(pad, pad)],
            dimension_numbers=("NCH", "HIO", "NCH"))
        return y + q["bias"][None, :, None]

    h = lrelu(conv(x, "conv1"))
    h = lrelu(conv(h, "conv2"))
    core = {"params": p["rale"],
            "batch_stats": {"conv1_bn": s["rale"]["conv1_bn"]}}
    h = apply_packed(core, h, variant=variant, mm_dtype=mm_dtype)
    h = lrelu(conv(h, "conv3"))
    return conv(h, "conv4")
