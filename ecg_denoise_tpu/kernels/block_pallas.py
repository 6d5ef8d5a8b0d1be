"""Fused LE-Transformer BLOCK kernel (inference path).

The attention-only kernel (attention_pallas.py) still leaves ~8 separate
XLA ops per TransformerBlock (LN, 3 projection matmuls, softmax chain, MLP
matmuls, LeFF conv) — at RA-LENet's tiny shapes each is overhead/latency
bound. This kernel executes the ENTIRE block
(reference model/transformer.py:383-411 semantics):

    h  = x*sqrt(C) + PE; h = LN1(h)
    q,k,v = h @ Wq, h @ Wkv (split);  per-head softmax(q k^T * scale + bias) v
    x  = x + (attn @ Wproj)
    f  = gelu(LN2(x) @ W1)
    [LeFF: channel 0 of f convolved k3 over length; then gelu over ALL
     channels again — the reference's double-gelu quirk preserved]
    y  = x + f @ W2

in ONE pallas_call per block: every intermediate lives in VMEM, weights
(<= 0.7 MB/block) are loaded once per grid step, and the only HBM traffic
is x in / y out. Grid = (B/G,) with the same padded-VMEM group sizing as
the attention kernel. Forward-only by design: training keeps the XLA path
(autodiff), serving/bench use this.

Layout notes: projections run as one (G*L, C) x (C, ...) matmul on the MXU;
the attention inner uses the (G*H, L, L) batched contraction; the LeFF conv
is two shifted adds (k=3) on a (G, L) slab.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ecg_denoise_tpu.kernels.attention_pallas import _group_size, _softmax_f32

_INTERPRET = False


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (|error| <= 1.5e-7).

    Mosaic implements neither erfc (used by jax.nn.gelu(approximate=False))
    nor erf, so the polynomial runs on the VPU: t = 1/(1+p|x|), odd
    extension by sign. gelu error <= ~1e-7*|x| — far inside the 2e-4
    parity tolerance vs the XLA exact-erf path.
    """
    a = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a[0] + t * (a[1] + t * (a[2] + t * (a[3] + t * a[4]))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    """Exact-form (erf) GELU matching jax.nn.gelu(approximate=False)."""
    return 0.5 * x * (1.0 + _erf(x * (2.0 ** -0.5)))


_MM_DTYPE = jnp.float32  # set to bfloat16 for MXU fast-path matmuls


def _mm(a, b):
    return jax.lax.dot_general(
        a.astype(_MM_DTYPE), b.astype(_MM_DTYPE),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _ln(h, scale, bias, eps=1e-5):
    m = jnp.mean(h, axis=-1, keepdims=True)
    v = jnp.mean((h - m) ** 2, axis=-1, keepdims=True)
    return (h - m) * jax.lax.rsqrt(v + eps) * scale + bias


def _block_kernel(x_ref, pe_ref, bias_ref,
                  ln1s_ref, ln1b_ref, wq_ref, bq_ref, wkv_ref, bkv_ref,
                  wp_ref, bp_ref, ln2s_ref, ln2b_ref, w1_ref, b1_ref,
                  cw_ref, w2_ref, b2_ref, o_ref, *, num_heads: int):
    G, L, C = x_ref.shape
    H = num_heads
    D = C // H
    x = x_ref[:].astype(jnp.float32)  # (G, L, C)

    # --- part 1: PE inject + LN1 (reference :386-388) ---
    h = x * math.sqrt(C) + pe_ref[:].astype(jnp.float32)
    h = _ln(h, ln1s_ref[:].astype(jnp.float32), ln1b_ref[:].astype(jnp.float32))

    # --- qkv projections as (G*L, C) matmuls ---
    h2d = h.reshape(G * L, C)
    q = (_mm(h2d, wq_ref[:].astype(jnp.float32)) + bq_ref[:]).reshape(G, L, C)
    kv = _mm(h2d, wkv_ref[:].astype(jnp.float32)) + bkv_ref[:]
    k = kv[:, :C].reshape(G, L, C)
    v = kv[:, C:].reshape(G, L, C)

    # --- attention, all heads in ONE batched contraction. Mosaic's layout
    # inference rejects the (L, H, D) <-> (H, L, D) reshape ("unsupported
    # shape cast"), but building (G, H, L, D) by CONCATENATING lane slices
    # along a new axis is layout-legal — and a (G*H)-batched matmul then
    # runs the heads together instead of an unrolled serial loop (measured:
    # loop 32.0k w/s, batched 34k+ on the attention-only kernel). ---
    # Heads-major batch (index = h*G + g) built from pure 3D ops only:
    # lane slices + leading-dim concats. Mosaic rejects 4D reshapes
    # ("unsupported shape cast") and 4D/strided indexing (">2D gather").
    scale = D ** -0.5

    def split_heads(t):
        return jnp.concatenate(
            [t[:, :, hd * D:(hd + 1) * D] for hd in range(H)], axis=0
        )  # (H*G, L, D)

    qh = (split_heads(q) * scale).astype(_MM_DTYPE)
    kh = split_heads(k).astype(_MM_DTYPE)
    vh = split_heads(v).astype(_MM_DTYPE)
    logits = jax.lax.dot_general(
        qh, kh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (H*G, L, L)
    if bias_ref is not None:
        bias_f = bias_ref[:].astype(jnp.float32)  # (H, L, L)
        bias_rows = jnp.concatenate(
            [
                jnp.broadcast_to(bias_f[hd:hd + 1], (G, L, L))
                for hd in range(H)
            ],
            axis=0,
        )  # (H*G, L, L)
        logits = logits + bias_rows
    p = _softmax_f32(logits)
    o = jax.lax.dot_general(
        p.astype(_MM_DTYPE), vh, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (H*G, L, D)
    attn = jnp.concatenate(
        [o[hd * G:(hd + 1) * G] for hd in range(H)], axis=-1
    )  # (G, L, C)
    attn = _mm(attn.reshape(G * L, C), wp_ref[:].astype(jnp.float32)) + bp_ref[:]
    x = x + attn.reshape(G, L, C)  # residual (pre-PE shortcut, :405)

    # --- part 2: LN2 + LeFF MLP (reference :392-395) ---
    h = _ln(x, ln2s_ref[:].astype(jnp.float32), ln2b_ref[:].astype(jnp.float32))
    hid = w1_ref.shape[1]
    f = _mm(h.reshape(G * L, C), w1_ref[:].astype(jnp.float32)) + b1_ref[:]
    f = _gelu_exact(f).reshape(G, L, hid)
    if cw_ref is not None:
        # PartialConv with n_div == hidden: ONLY channel 0 is convolved
        # (k=3, pad=1, no bias; reference transformer.py:144) ...
        c0 = f[:, :, 0]  # (G, L)
        left = jnp.pad(c0, ((0, 0), (1, 0)))[:, :L]
        right = jnp.pad(c0, ((0, 0), (0, 1)))[:, 1:]
        cw = cw_ref[:].astype(jnp.float32)  # (3,)
        c0 = cw[0] * left + cw[1] * c0 + cw[2] * right
        f = jnp.concatenate([c0[:, :, None], f[:, :, 1:]], axis=-1)
        # ... then gelu over ALL channels AGAIN (double-gelu quirk, :142-146).
        f = _gelu_exact(f)
    out = _mm(f.reshape(G * L, hid), w2_ref[:].astype(jnp.float32)) + b2_ref[:]
    o_ref[:] = (x + out.reshape(G, L, C)).astype(o_ref.dtype)


def fused_block(x, pe, bias, params, *, num_heads: int, local_enhence: bool):
    """Apply one fused TransformerBlock.

    x: (B, L, C); pe: (L, C) absolute-PE slice; bias: (1|H, L, L) or None;
    params: the block's flax param subtree (norm1/attn/norm2/mlp).
    """
    B, L, C = x.shape
    G = _group_size(B, num_heads, L)
    attn_p, mlp_p = params["attn"], params["mlp"]
    has_bias = bias is not None
    has_conv = local_enhence

    weights = (
        params["norm1"]["scale"], params["norm1"]["bias"],
        attn_p["qkv_proj"]["to_q"]["kernel"], attn_p["qkv_proj"]["to_q"]["bias"],
        attn_p["qkv_proj"]["to_kv"]["kernel"], attn_p["qkv_proj"]["to_kv"]["bias"],
        attn_p["proj"]["kernel"], attn_p["proj"]["bias"],
        params["norm2"]["scale"], params["norm2"]["bias"],
        mlp_p["fc1"]["kernel"], mlp_p["fc1"]["bias"],
    )
    conv_w = (
        (mlp_p["leconv"]["partial_conv3"]["kernel"].reshape(3),) if has_conv else ()
    )
    weights = weights + conv_w + (mlp_p["fc2"]["kernel"], mlp_p["fc2"]["bias"])

    def kernel(x_ref, pe_ref, *refs, o_ref=None):
        i = 0
        bias_ref = None
        if has_bias:
            bias_ref = refs[0]
            i = 1
        wrefs = list(refs[i:])
        if not has_conv:
            wrefs.insert(12, None)  # cw_ref slot
        _block_kernel(x_ref, pe_ref, bias_ref, *wrefs, o_ref=o_ref,
                      num_heads=num_heads)

    def kernel_entry(*refs):
        kernel(*refs[:-1], o_ref=refs[-1])

    x_spec = pl.BlockSpec((G, L, C), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda b, _n=arr.ndim: (0,) * _n, memory_space=pltpu.VMEM
    )
    in_specs = [x_spec, full(pe)]
    args = [x, pe]
    if has_bias:
        b3 = bias.reshape(num_heads, L, L)
        in_specs.append(full(b3))
        args.append(b3)
    for w in weights:
        in_specs.append(full(w))
        args.append(w)

    return pl.pallas_call(
        kernel_entry,
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((B, L, C), x.dtype),
        interpret=_INTERPRET,
    )(*args)
