"""RaleNet fast inference: fused-layer Pallas forward over a standard
variables tree.

`apply_fast(variables, x, variant=...)` reproduces `RaleNet.apply(...,
train=False)` (parity-tested <= 2e-4 with mm_dtype=float32; the default
mm_dtype=bfloat16 is the MXU fast path with its own looser parity test)
but runs every BasicLayer — a whole stage's TransformerBlocks — as ONE
fused Pallas kernel (kernels/block_pallas.py); the conv stem/head, rel-pos
biases and PatchMerging/Separate stay XLA — they are single cheap ops.
Weight layout is the SAME tree produced by RaleNet.init / checkpoints, so
any trained checkpoint drops in (serving.Denoiser(fast=...), bench.py
--fast).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ecg_denoise_tpu.kernels.block_pallas import fused_layer, fused_layer_diff
from ecg_denoise_tpu.ops.attention import sinusoidal_pe_table

_CHANNELS = [2 ** (i + 3) for i in range(5)]
_HEADS = [2 ** (i + 1) for i in range(5)]
_LENGTHS = [2 ** (8 - i) for i in range(5)]
_WINDOWS = [32, 16, 8, 4]


def _conv1d(x, p, padding):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (1,), [(padding, padding)],
        dimension_numbers=("NCH", "HIO", "NCH"),
    )
    return y + p["bias"][None, :, None]


def _bn_eval(x, p, s, eps=1e-5):
    inv = jax.lax.rsqrt(s["var"] + eps) * p["scale"]
    return (x - s["mean"][None, :, None]) * inv[None, :, None] + p["bias"][None, :, None]


def _ln(x, p, eps=1e-5):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean((x - m) ** 2, axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * p["scale"] + p["bias"]


def _patch_merge(x, p):
    x = jnp.concatenate([x[:, 0::2, :], x[:, 1::2, :]], axis=-1)
    return _ln(x, p["norm"]) @ p["reduction"]["kernel"]


def _patch_sep(x, p):
    half = x.shape[-1] // 2
    x = jnp.concatenate([x[:, :, :half], x[:, :, half:]], axis=1)
    return _ln(x, p["norm"]) @ p["reduction"]["kernel"]


def _rwbias(p, W, L, H, r_pos=None):
    table = jnp.asarray(p["relative_position_bias_table"])
    coords = jnp.arange(W)
    rel = coords[:, None] - coords[None, :] + (W - 1)
    local = table[rel.reshape(-1)].reshape(W, W, H).transpose(2, 0, 1)
    offset = (L - W) // 2 if r_pos is None else r_pos - W // 2
    # Edge TRUNCATION semantics (match ops/attention.py and the reference's
    # negative F.pad): update into a W-margin buffer, crop.
    big = jnp.zeros((H, L + 2 * W, L + 2 * W), jnp.float32)
    off = jnp.clip(jnp.asarray(offset) + W, 0, L + W)
    big = jax.lax.dynamic_update_slice(big, local, (0, off, off))
    return big[:, W:W + L, W:W + L]


def _basic_layer(x, p, pe, bias, num_heads, local_enhence, mm_dtype):
    # Numeric sort: lexicographic would mis-order blocks_10 before blocks_2.
    names = sorted((k for k in p if k.startswith("blocks_")),
                   key=lambda k: int(k.split("_")[1]))
    return fused_layer(x, pe, bias, [p[n] for n in names],
                       num_heads=num_heads, local_enhence=local_enhence,
                       mm_dtype=mm_dtype)


def apply_fast(variables, x, variant: str = "full",
               r_pos: Optional[jnp.ndarray] = None,
               mm_dtype=jnp.bfloat16):
    """Eval-mode RaleNet forward with fused-layer kernels. x: (B, 2, 256).

    mm_dtype: in-kernel matmul compute dtype (f32 accumulation either way);
    bfloat16 = the MXU fast path used by serving and the headline bench.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    local_enhence = variant in ("nra", "full")
    use_bias = variant in ("mlp", "full")

    h = _conv1d(x, params["conv1_conv"], padding=1)
    h = jax.nn.leaky_relu(h, negative_slope=0.2)
    h = _bn_eval(h, params["conv1_bn"], stats["conv1_bn"])
    stem = h

    attn = [None] * 4
    if use_bias:
        for i in range(4):
            rp = None if r_pos is None else r_pos // (2 ** i)
            attn[i] = _rwbias(params[f"rwattn{i + 1}"], _WINDOWS[i],
                              _LENGTHS[i], _HEADS[i], rp)

    def pe_for(L, C):
        return sinusoidal_pe_table(1000, C)[0, :L, :]

    h = stem.transpose(0, 2, 1)
    skips = []
    for i in range(4):
        h = _basic_layer(h, params[f"dtransformer{i + 1}"],
                         pe_for(_LENGTHS[i], _CHANNELS[i]), attn[i],
                         _HEADS[i], local_enhence, mm_dtype)
        h = _patch_merge(h, params[f"pm{i + 1}"])
        skips.append(h)

    h = _basic_layer(skips[3], params["transformer"],
                     pe_for(_LENGTHS[4], _CHANNELS[4]), None,
                     _HEADS[4], local_enhence, mm_dtype) + skips[3]

    dec_masks = [None, attn[3], attn[2], attn[1]]
    for j, i in enumerate(range(4, 0, -1)):
        h = _basic_layer(h, params[f"utransformer{i}"],
                         pe_for(_LENGTHS[i], _CHANNELS[i]), dec_masks[j],
                         _HEADS[i], local_enhence, mm_dtype)
        h = _patch_sep(h, params[f"ps{i}"])
        if i > 1:
            h = h + skips[i - 2]

    h = h.transpose(0, 2, 1) + stem
    return _conv1d(h, params["transconv"], padding=1)


def _bn_train(x, p, s, momentum=0.1, eps=1e-5):
    """Train-mode BatchNorm1d matching ops/layers.BatchNorm1d: normalise by
    the biased batch variance, update running stats with the unbiased one
    (torch convention). Returns (y, new_stats)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 2))
    var = jnp.mean((xf - mean[None, :, None]) ** 2, axis=(0, 2))
    n = x.shape[0] * x.shape[2]
    unbiased = var * (n / max(n - 1, 1))
    new_stats = {
        "mean": (1 - momentum) * s["mean"] + momentum * mean,
        "var": (1 - momentum) * s["var"] + momentum * unbiased,
    }
    inv = jax.lax.rsqrt(var + eps) * p["scale"]
    y = (xf - mean[None, :, None]) * inv[None, :, None] + p["bias"][None, :, None]
    return y, new_stats


def _basic_layer_diff(x, p, pe, bias, num_heads, local_enhence, mm_dtype,
                      backend, strategy="fused"):
    names = sorted((k for k in p if k.startswith("blocks_")),
                   key=lambda k: int(k.split("_")[1]))
    return fused_layer_diff(x, pe, bias, [p[n] for n in names],
                            num_heads=num_heads, local_enhence=local_enhence,
                            mm_dtype=mm_dtype, backend=backend,
                            strategy=strategy)


def apply_fast_train(variables, x, variant: str = "full",
                     r_pos: Optional[jnp.ndarray] = None,
                     mm_dtype=jnp.float32, backend: str = "auto",
                     strategy: str = "fused"):
    """TRAIN-mode RaleNet forward on the differentiable fused-layer kernels.

    Same weight tree and semantics as RaleNet.apply(..., train=True,
    mutable=['batch_stats']) — train-mode BatchNorm in the stem with
    running-stat updates — but every BasicLayer runs through
    kernels/block_pallas.fused_layer_diff (Pallas fwd + in-kernel-vjp bwd;
    per-stage XLA fallback when the backward working set cannot fit VMEM,
    see `backend`). Returns (y, new_batch_stats).

    mm_dtype defaults to f32 for training parity with the XLA path.
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    local_enhence = variant in ("nra", "full")
    use_bias = variant in ("mlp", "full")

    h = _conv1d(x, params["conv1_conv"], padding=1)
    h = jax.nn.leaky_relu(h, negative_slope=0.2)
    h, bn_stats = _bn_train(h, params["conv1_bn"], stats["conv1_bn"])
    stem = h

    attn = [None] * 4
    if use_bias:
        for i in range(4):
            rp = None if r_pos is None else r_pos // (2 ** i)
            attn[i] = _rwbias(params[f"rwattn{i + 1}"], _WINDOWS[i],
                              _LENGTHS[i], _HEADS[i], rp)

    def pe_for(L, C):
        return sinusoidal_pe_table(1000, C)[0, :L, :]

    h = stem.transpose(0, 2, 1)
    skips = []
    for i in range(4):
        h = _basic_layer_diff(h, params[f"dtransformer{i + 1}"],
                              pe_for(_LENGTHS[i], _CHANNELS[i]), attn[i],
                              _HEADS[i], local_enhence, mm_dtype, backend,
                              strategy)
        h = _patch_merge(h, params[f"pm{i + 1}"])
        skips.append(h)

    h = _basic_layer_diff(skips[3], params["transformer"],
                          pe_for(_LENGTHS[4], _CHANNELS[4]), None,
                          _HEADS[4], local_enhence, mm_dtype, backend,
                          strategy) + skips[3]

    dec_masks = [None, attn[3], attn[2], attn[1]]
    for j, i in enumerate(range(4, 0, -1)):
        h = _basic_layer_diff(h, params[f"utransformer{i}"],
                              pe_for(_LENGTHS[i], _CHANNELS[i]), dec_masks[j],
                              _HEADS[i], local_enhence, mm_dtype, backend,
                              strategy)
        h = _patch_sep(h, params[f"ps{i}"])
        if i > 1:
            h = h + skips[i - 2]

    h = h.transpose(0, 2, 1) + stem
    y = _conv1d(h, params["transconv"], padding=1)
    return y, {"conv1_bn": bn_stats}
