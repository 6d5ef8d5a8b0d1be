"""Fused LE-Transformer BLOCK / LAYER kernels (inference path).

The attention-only kernel (attention_pallas.py) still leaves ~8 separate
XLA ops per TransformerBlock (LN, 3 projection matmuls, softmax chain, MLP
matmuls, LeFF conv) — at RA-LENet's tiny shapes each is overhead/latency
bound. These kernels execute an ENTIRE block
(reference model/transformer.py:383-411 semantics):

    h  = x*sqrt(C) + PE; h = LN1(h)
    q,k,v = h @ Wq, h @ Wkv (split);  per-head softmax(q k^T * scale + bias) v
    x  = x + (attn @ Wproj)
    f  = gelu(LN2(x) @ W1)
    [LeFF: channel 0 of f convolved k3 over length; then gelu over ALL
     channels again — the reference's double-gelu quirk preserved]
    y  = x + f @ W2

— and `fused_layer` runs a whole BasicLayer (all of a stage's blocks,
reference transformer.py:492-506) in ONE pallas_call: every intermediate
lives in VMEM, the stage's weights and the R-wave bias are VMEM-resident
across the grid sweep (their BlockSpec index never changes, so Mosaic loads
them once), and the only per-step HBM traffic is x in / y out. Grid =
(B/G,) with a block-kernel-specific padded-VMEM working-set estimate
choosing G (ADVICE round-1: the attention-only budget under-counted the
qkv/MLP/weight slabs). Forward-only by design: training keeps the XLA path
(autodiff); serving/bench use this.

Layout notes: projections run as one (G*L, C) x (C, ...) matmul on the MXU;
the attention inner uses the (G*H, L, L) batched contraction; the LeFF conv
is two shifted adds (k=3) on a (G, L) slab. Matmul compute dtype is a real
parameter (`mm_dtype`) — bfloat16 hits the MXU fast path with f32
accumulation and is the serving/bench default (ADVICE round-1: a module
global here was mutated by bench.py and never covered by parity tests).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


# Shared numerics-critical helper: one definition for both kernel modules.
from ecg_denoise_tpu.kernels.attention_pallas import _softmax_f32  # noqa: E402


def _mm(a, b, mm_dtype):
    return jax.lax.dot_general(
        a.astype(mm_dtype), b.astype(mm_dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _ln(h, scale, bias, eps=1e-5):
    m = jnp.mean(h, axis=-1, keepdims=True)
    v = jnp.mean((h - m) ** 2, axis=-1, keepdims=True)
    return (h - m) * jax.lax.rsqrt(v + eps) * scale + bias


# --- VMEM working-set sizing --------------------------------------------------
#
# Padded-tile accounting (sublane multiples of 8, lane multiples of 128 —
# budgeting LOGICAL elements OOMed the ~16 MB scoped vmem on v5e). The block
# kernel's per-G-unit working set, in padded f32 elements:
#   * (G, L, C)-class slabs: x, h(+ln), attn-out, y     ~ 5 x L*pad(C)
#   * kv projection slab (G*L, 2C)                      ~ L*pad(2C)
#   * heads-major q/k/v (+scaled copies) (H*G, L, D)    ~ 4 x H*L*pad(D)
#   * logits/bias-broadcast/probs (H*G, L, L)           ~ 3 x H*L*pad(L)
#   * MLP hidden x2 (gelu in/out) (G*L, hid)            ~ 2 x L*pad(hid)
# Weights/PE/bias are G-independent (VMEM-resident across the sweep) and
# small (<~1.5 MB/stage); the budget below leaves room for them plus
# Mosaic's x/y double buffering.

_LANE = 128
_SUB = 8
_BUDGET_BYTES = 8 * 1024 * 1024  # of ~16 MB VMEM


def _pad_lane(n: int) -> int:
    return -(-n // _LANE) * _LANE


def _pad_sub(n: int) -> int:
    return -(-n // _SUB) * _SUB


def _block_unit_elems(H: int, L: int, C: int, hid: int) -> int:
    """Padded f32 elements of the per-G-unit block working set (see above)."""
    D = C // H
    Ls = _pad_sub(L)
    return (
        5 * Ls * _pad_lane(C)
        + Ls * _pad_lane(2 * C)
        + 4 * H * Ls * _pad_lane(D)
        + 3 * H * Ls * _pad_lane(L)
        + 2 * Ls * _pad_lane(hid)
    )


def block_group_size(B: int, H: int, L: int, C: int, hid: int,
                     unit_scale: float = 1.0) -> int:
    """Largest divisor of B whose working set fits the VMEM budget.

    unit_scale inflates the per-window estimate for the BACKWARD kernel:
    jax.vjp of the layer math keeps each block's forward intermediates live
    until its cotangents are consumed, roughly (n_blocks + 2) x the forward
    set before Mosaic's liveness reuse (which the estimate ignores — it is
    deliberately conservative).
    """
    unit = _block_unit_elems(H, L, C, hid) * 4 * unit_scale  # f32 bytes
    g = 1
    for cand in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if B % cand == 0 and cand * unit <= _BUDGET_BYTES:
            g = cand
            break
    return g


# --- kernel math (pure jnp on VMEM-resident arrays) ---------------------------


def _block_math(x, pe, bias_f, w, *, num_heads: int, mm_dtype):
    """One TransformerBlock on a (G, L, C) f32 activation slab.

    w: (ln1s, ln1b, wq, bq, wkv, bkv, wp, bp, ln2s, ln2b, w1, b1, cw|None,
        w2, b2) — all f32 arrays already loaded from VMEM refs.
    bias_f: (H, L, L) f32 or None.
    """
    G, L, C = x.shape
    H = num_heads
    D = C // H
    (ln1s, ln1b, wq, bq, wkv, bkv, wp, bp,
     ln2s, ln2b, w1, b1, cw, w2, b2) = w

    # --- part 1: PE inject + LN1 (reference :386-388) ---
    h = x * math.sqrt(C) + pe
    h = _ln(h, ln1s, ln1b)

    # --- qkv projections as (G*L, C) matmuls ---
    h2d = h.reshape(G * L, C)
    q = (_mm(h2d, wq, mm_dtype) + bq).reshape(G, L, C)
    kv = _mm(h2d, wkv, mm_dtype) + bkv
    k = kv[:, :C].reshape(G, L, C)
    v = kv[:, C:].reshape(G, L, C)

    # --- attention, all heads in ONE batched contraction. Mosaic's layout
    # inference rejects the (L, H, D) <-> (H, L, D) reshape ("unsupported
    # shape cast"), but building the heads-major batch (index = h*G + g) by
    # CONCATENATING lane slices along the leading axis is layout-legal — and
    # a (G*H)-batched matmul runs the heads together instead of an unrolled
    # serial loop (measured: loop 32.0k w/s, batched 41k+). ---
    scale = D ** -0.5

    def split_heads(t):
        return jnp.concatenate(
            [t[:, :, hd * D:(hd + 1) * D] for hd in range(H)], axis=0
        )  # (H*G, L, D)

    qh = (split_heads(q) * scale).astype(mm_dtype)
    kh = split_heads(k).astype(mm_dtype)
    vh = split_heads(v).astype(mm_dtype)
    logits = jax.lax.dot_general(
        qh, kh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (H*G, L, L)
    if bias_f is not None:
        # Add per-head bias on the (G, L, L) slices (broadcast (1, L, L)) —
        # cheaper than materialising an (H*G, L, L) broadcast copy.
        logits = jnp.concatenate(
            [logits[hd * G:(hd + 1) * G] + bias_f[hd:hd + 1] for hd in range(H)],
            axis=0,
        )
    # Softmax with the round-3e sum/divide FOLD (ported from
    # attention_pallas): exp once, then the pv contraction against v
    # augmented with a ones channel emits the softmax normalizer as a free
    # extra output channel (D=4 pads to 8 lanes regardless), deleting the
    # (L, L)-wide sum tree and divide. f32 operands would need
    # precision=HIGHEST on the folded pv (Mosaic DEFAULT f32 is a single
    # bf16 pass -> correlated per-row scale error; probe_precision.py);
    # this engine's pv runs in mm_dtype=bf16 where single-pass is native.
    e = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    vh_aug = jnp.concatenate(
        [vh, jnp.ones(vh.shape[:2] + (1,), vh.dtype)], axis=-1)
    prec = (jax.lax.Precision.HIGHEST if mm_dtype == jnp.float32 else None)
    o_aug = jax.lax.dot_general(
        e.astype(mm_dtype), vh_aug, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (H*G, L, D+1); last channel = sum_m e[l, m]
    o = o_aug[:, :, :D] / o_aug[:, :, D:]
    attn = jnp.concatenate(
        [o[hd * G:(hd + 1) * G] for hd in range(H)], axis=-1
    )  # (G, L, C)
    attn = _mm(attn.reshape(G * L, C), wp, mm_dtype) + bp
    x = x + attn.reshape(G, L, C)  # residual (pre-PE shortcut, :405)

    # --- part 2: LN2 + LeFF MLP (reference :392-395) ---
    h = _ln(x, ln2s, ln2b)
    hid = w1.shape[1]
    f = _mm(h.reshape(G * L, C), w1, mm_dtype) + b1
    f = _gelu_exact(f).reshape(G, L, hid)
    if cw is not None:
        # PartialConv with n_div == hidden: ONLY channel 0 is convolved
        # (k=3, pad=1, no bias; reference transformer.py:144). The +-1
        # shifts run as matmuls with constant 0/1 shift matrices: pad+slice
        # VJPs lower to negative-size pads Mosaic rejects, and roll/concat
        # formulations hit "offset mismatch on non-concat dimension" at
        # large G — dot_general is the one shift whose forward AND
        # transpose lower robustly (and zero-fills both boundaries, exactly
        # the conv's pad=1 semantics). Cost is a (G,L)x(L,L) MXU matmul.
        c0 = f[:, :, 0]  # (G, L)
        sh = (jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
              - jax.lax.broadcasted_iota(jnp.int32, (L, L), 1))
        shift = lambda m: jax.lax.dot_general(
            c0, (sh == m).astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        c0 = cw[0] * shift(-1) + cw[1] * c0 + cw[2] * shift(1)
        f = jnp.concatenate([c0[:, :, None], f[:, :, 1:]], axis=-1)
        # ... then gelu over ALL channels AGAIN (double-gelu quirk, :142-146).
        f = _gelu_exact(f)
    out = _mm(f.reshape(G * L, hid), w2, mm_dtype) + b2
    return x + out.reshape(G, L, C)


_W_NAMES = 15  # per-block weight slots in _block_math order (cw may be None)


def _block_weights(params, local_enhence: bool):
    """Flatten one block's flax param subtree into the _block_math order.

    Returns a list of arrays with None in the cw slot when there is no
    LeFF conv (the reference's local_enhence=False variants).
    """
    attn_p, mlp_p = params["attn"], params["mlp"]
    return [
        params["norm1"]["scale"], params["norm1"]["bias"],
        attn_p["qkv_proj"]["to_q"]["kernel"], attn_p["qkv_proj"]["to_q"]["bias"],
        attn_p["qkv_proj"]["to_kv"]["kernel"], attn_p["qkv_proj"]["to_kv"]["bias"],
        attn_p["proj"]["kernel"], attn_p["proj"]["bias"],
        params["norm2"]["scale"], params["norm2"]["bias"],
        mlp_p["fc1"]["kernel"], mlp_p["fc1"]["bias"],
        (mlp_p["leconv"]["partial_conv3"]["kernel"].reshape(3)
         if local_enhence else None),
        mlp_p["fc2"]["kernel"], mlp_p["fc2"]["bias"],
    ]


def fused_layer(x, pe, bias, blocks_params: Sequence,
                *, num_heads: int, local_enhence: bool,
                mm_dtype=jnp.bfloat16):
    """Apply a whole BasicLayer (N TransformerBlocks) as ONE pallas_call.

    x: (B, L, C); pe: (L, C) absolute-PE slice; bias: (1|H, L, L) or None;
    blocks_params: the stage's block param subtrees, in execution order.
    All blocks' weights + the bias are VMEM-resident for the whole grid
    sweep (their block index never changes), so HBM traffic is x in / y out
    once per group — the weights are NOT re-fetched per grid step.
    """
    B, L, C = x.shape
    flat_w, has_cw, hid = flatten_blocks_params(blocks_params, local_enhence)
    b3 = None if bias is None else bias.reshape(num_heads, L, L)
    return _fused_layer_call(x, pe, b3, flat_w, has_cw,
                             num_heads=num_heads, mm_dtype=mm_dtype, hid=hid)


def fused_block(x, pe, bias, params, *, num_heads: int, local_enhence: bool,
                mm_dtype=jnp.bfloat16):
    """Apply one fused TransformerBlock (single-block fused_layer)."""
    return fused_layer(x, pe, bias, [params], num_heads=num_heads,
                       local_enhence=local_enhence, mm_dtype=mm_dtype)


# --- differentiable fused layer (training path, SURVEY §7 step 6) -------------
#
# custom_vjp around the SAME layer math: the forward is one pallas_call per
# stage (identical to fused_layer, but over a FLAT weight tuple so the
# cotangent structure is explicit); the backward is ONE pallas_call that
# RECOMPUTES the forward in-kernel (flash-style — no inter-kernel residuals
# beyond the inputs) and differentiates it with an in-kernel jax.vjp. dx is
# written per grid step; dbias and every weight gradient use the TPU grid's
# sequential execution as an accumulator (zero at step 0, += after), exactly
# like attention_pallas._bwd_kernel's dbias.


def _flat_to_blocks(flat, has_cw: Sequence[bool]):
    """Regroup a flat weight tuple into per-block _block_math w-lists."""
    blocks, i = [], 0
    for cw_flag in has_cw:
        n_w = _W_NAMES - (0 if cw_flag else 1)
        w = list(flat[i:i + n_w])
        i += n_w
        if not cw_flag:
            w.insert(12, None)
        blocks.append(w)
    assert i == len(flat), (i, len(flat))
    return blocks


def flatten_blocks_params(blocks_params: Sequence, local_enhence: bool):
    """Flax block subtrees -> (flat weight tuple, has_cw tuple, hidden dim)."""
    flat, has_cw, hid = [], [], 0
    for bp in blocks_params:
        w = _block_weights(bp, local_enhence)
        hid = max(hid, w[10].shape[1])
        has_cw.append(w[12] is not None)
        flat.extend(a for a in w if a is not None)
    return tuple(flat), tuple(has_cw), hid


def _layer_math(x, pe, bias_f, flat_w, has_cw, *, num_heads: int, mm_dtype):
    """Whole-stage math on f32 values (shared by fwd/bwd kernels + the XLA
    fallback; differentiable by construction)."""
    for w in _flat_to_blocks(flat_w, has_cw):
        x = _block_math(x, pe, bias_f, w, num_heads=num_heads,
                        mm_dtype=mm_dtype)
    return x


def layer_math_xla(x, pe, bias, flat_w, has_cw, *, num_heads: int,
                   mm_dtype=jnp.float32):
    """The identical stage math as plain XLA ops (no pallas_call).

    Serves two roles: the numerics oracle for the kernel tests, and the
    per-stage fallback when the backward working-set estimate exceeds VMEM
    (fused_layer_diff(..., backend='xla')). Differentiable by XLA autodiff.
    """
    bias_f = None if bias is None else bias.astype(jnp.float32)
    y = _layer_math(x.astype(jnp.float32), pe.astype(jnp.float32), bias_f,
                    flat_w, has_cw, num_heads=num_heads, mm_dtype=mm_dtype)
    return y.astype(x.dtype)


def _fused_layer_call(x, pe, bias, flat_w, has_cw, *, num_heads: int,
                      mm_dtype, hid: int):
    """Forward pallas_call over flat weights (same kernel as fused_layer)."""
    B, L, C = x.shape
    has_bias = bias is not None
    n_flat = len(flat_w)
    G = block_group_size(B, num_heads, L, C, hid)

    def kernel(*refs):
        o_ref = refs[-1]
        x_val = refs[0][:].astype(jnp.float32)
        pe_val = refs[1][:].astype(jnp.float32)
        idx = 2
        bias_f = None
        if has_bias:
            bias_f = refs[idx][:].astype(jnp.float32)
            idx += 1
        w_vals = tuple(r[:].astype(jnp.float32) for r in refs[idx:idx + n_flat])
        y = _layer_math(x_val, pe_val, bias_f, w_vals, has_cw,
                        num_heads=num_heads, mm_dtype=mm_dtype)
        o_ref[:] = y.astype(o_ref.dtype)

    x_spec = pl.BlockSpec((G, L, C), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda b, _n=arr.ndim: (0,) * _n, memory_space=pltpu.VMEM
    )
    in_specs = [x_spec, full(pe)]
    args = [x, pe]
    if has_bias:
        in_specs.append(full(bias))
        args.append(bias)
    for w in flat_w:
        in_specs.append(full(w))
        args.append(w)
    return pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((B, L, C), x.dtype),
        interpret=_INTERPRET,
    )(*args)


def _fused_layer_bwd_call(x, pe, bias, flat_w, g, has_cw, *, num_heads: int,
                          mm_dtype, hid: int):
    """Backward pallas_call: recompute + in-kernel vjp, grads accumulated
    across the sequential grid. Returns (dx, dbias|None, dflat_w tuple)."""
    B, L, C = x.shape
    has_bias = bias is not None
    n_flat = len(flat_w)
    n_blocks = len(has_cw)
    G = block_group_size(B, num_heads, L, C, hid,
                         unit_scale=float(n_blocks + 2))
    n_in = 2 + (1 if has_bias else 0) + n_flat + 1

    def kernel(*refs):
        in_refs, out_refs = refs[:n_in], refs[n_in:]
        first = pl.program_id(0) == 0
        x_val = in_refs[0][:].astype(jnp.float32)
        pe_val = in_refs[1][:].astype(jnp.float32)
        idx = 2
        bias_val = None
        if has_bias:
            bias_val = in_refs[idx][:].astype(jnp.float32)
            idx += 1
        w_vals = tuple(r[:].astype(jnp.float32) for r in in_refs[idx:idx + n_flat])
        g_val = in_refs[-1][:].astype(jnp.float32)

        if has_bias:
            def fn(xv, bv, wv):
                return _layer_math(xv, pe_val, bv, wv, has_cw,
                                   num_heads=num_heads, mm_dtype=mm_dtype)

            _, vjp = jax.vjp(fn, x_val, bias_val, w_vals)
            dx, dbias, dws = vjp(g_val)
        else:
            def fn(xv, wv):
                return _layer_math(xv, pe_val, None, wv, has_cw,
                                   num_heads=num_heads, mm_dtype=mm_dtype)

            _, vjp = jax.vjp(fn, x_val, w_vals)
            dx, dws = vjp(g_val)
            dbias = None

        out_refs[0][:] = dx.astype(out_refs[0].dtype)

        def accumulate(ref, val):
            @pl.when(first)
            def _():
                ref[:] = jnp.zeros(ref.shape, ref.dtype)

            ref[:] += val.astype(ref.dtype)

        oi = 1
        if has_bias:
            accumulate(out_refs[oi], dbias)
            oi += 1
        for dw in dws:
            accumulate(out_refs[oi], dw)
            oi += 1

    x_spec = pl.BlockSpec((G, L, C), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda b, _n=arr.ndim: (0,) * _n, memory_space=pltpu.VMEM
    )
    in_specs = [x_spec, full(pe)]
    args = [x, pe]
    if has_bias:
        in_specs.append(full(bias))
        args.append(bias)
    for w in flat_w:
        in_specs.append(full(w))
        args.append(w)
    in_specs.append(x_spec)
    args.append(g)

    out_specs = [x_spec]
    out_shape = [jax.ShapeDtypeStruct((B, L, C), x.dtype)]
    if has_bias:
        out_specs.append(full(bias))
        out_shape.append(jax.ShapeDtypeStruct(bias.shape, jnp.float32))
    for w in flat_w:
        out_specs.append(full(w))
        out_shape.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_INTERPRET,
    )(*args)
    dx = outs[0]
    oi = 1
    dbias = None
    if has_bias:
        dbias = outs[oi].astype(bias.dtype)
        oi += 1
    dws = tuple(o.astype(w.dtype) for o, w in zip(outs[oi:], flat_w))
    return dx, dbias, dws


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _fused_layer_diff(x, pe, bias, flat_w, has_cw, num_heads, mm_dtype, hid):
    return _fused_layer_call(x, pe, bias, flat_w, has_cw,
                             num_heads=num_heads, mm_dtype=mm_dtype, hid=hid)


def _fused_layer_diff_fwd(x, pe, bias, flat_w, has_cw, num_heads, mm_dtype, hid):
    y = _fused_layer_call(x, pe, bias, flat_w, has_cw,
                          num_heads=num_heads, mm_dtype=mm_dtype, hid=hid)
    return y, (x, pe, bias, flat_w)


def _fused_layer_diff_bwd(has_cw, num_heads, mm_dtype, hid, res, g):
    x, pe, bias, flat_w = res
    dx, dbias, dws = _fused_layer_bwd_call(
        x, pe, bias, flat_w, g, has_cw,
        num_heads=num_heads, mm_dtype=mm_dtype, hid=hid,
    )
    # pe is the constant sinusoidal table: no gradient flows to parameters
    # through it, but custom_vjp requires a cotangent for every diff arg.
    return dx, jnp.zeros_like(pe), dbias, dws


_fused_layer_diff.defvjp(_fused_layer_diff_fwd, _fused_layer_diff_bwd)


# --- residual-saving strategy (VERDICT r2 next-round item 6) ------------------
#
# The round-2 backward recomputes the ENTIRE block chain inside one
# pallas_call, so its VMEM estimate scales with (n_blocks + 2)x the forward
# working set, forcing G = 1..2 — tiny, strictly serialised matmuls
# (measured 0.48x XLA at batch 32). This strategy instead SAVES each
# block's input in HBM during the forward (one (B, L, C) slab per block —
# a few MB/stage) and runs the backward one block per pallas_call: each
# bwd call recomputes only its own block (unit_scale ~3x), so G lifts by
# ~(n_blocks + 2)/3 and the matmuls regain their batch width. Costs
# n_blocks kernel launches per direction instead of 1.


def _blocks_of(flat_w, has_cw):
    """Split the flat weight tuple into per-block (weights, has_cw) pairs."""
    out, i = [], 0
    for cw_flag in has_cw:
        n_w = _W_NAMES - (0 if cw_flag else 1)
        out.append((tuple(flat_w[i:i + n_w]), (cw_flag,)))
        i += n_w
    return out


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _fused_layer_diff_res(x, pe, bias, flat_w, has_cw, num_heads, mm_dtype,
                          hid):
    y = x
    for blk_w, blk_cw in _blocks_of(flat_w, has_cw):
        y = _fused_layer_call(y, pe, bias, blk_w, blk_cw,
                              num_heads=num_heads, mm_dtype=mm_dtype, hid=hid)
    return y


def _fused_layer_diff_res_fwd(x, pe, bias, flat_w, has_cw, num_heads,
                              mm_dtype, hid):
    xs = []
    y = x
    for blk_w, blk_cw in _blocks_of(flat_w, has_cw):
        xs.append(y)
        y = _fused_layer_call(y, pe, bias, blk_w, blk_cw,
                              num_heads=num_heads, mm_dtype=mm_dtype, hid=hid)
    return y, (tuple(xs), pe, bias, flat_w)


def _fused_layer_diff_res_bwd(has_cw, num_heads, mm_dtype, hid, res, g):
    xs, pe, bias, flat_w = res
    blocks = _blocks_of(flat_w, has_cw)
    dbias_acc = None
    dws_all = []
    for (blk_w, blk_cw), x_in in zip(reversed(blocks), reversed(xs)):
        g, dbias, dws = _fused_layer_bwd_call(
            x_in, pe, bias, blk_w, g, blk_cw,
            num_heads=num_heads, mm_dtype=mm_dtype, hid=hid,
        )
        dws_all = list(dws) + dws_all
        if dbias is not None:
            dbias_acc = dbias if dbias_acc is None else dbias_acc + dbias
    return g, jnp.zeros_like(pe), dbias_acc, tuple(dws_all)


_fused_layer_diff_res.defvjp(_fused_layer_diff_res_fwd,
                             _fused_layer_diff_res_bwd)


def fused_layer_diff(x, pe, bias, blocks_params: Sequence, *, num_heads: int,
                     local_enhence: bool, mm_dtype=jnp.float32,
                     backend: str = "auto", strategy: str = "fused"):
    """DIFFERENTIABLE whole-stage fused layer for the training path.

    Same semantics as fused_layer; gradients flow to x, bias (the R-wave
    rel-pos table upstream) and every block weight. mm_dtype defaults to
    f32 (training parity); bf16 engages the MXU fast path in both kernels.

    backend: 'pallas' forces the kernels, 'xla' the identical plain-XLA
    math (autodiff), 'auto' picks XLA only when even G=1 would blow the
    backward VMEM estimate (L=256 stages at depth>=2).

    strategy: 'fused' = the round-2 single-call backward (in-kernel
    full-chain recompute, G=1..2); 'residual' = per-block forward saving
    block inputs in HBM + per-block backward (larger G, more launches) —
    see the residual-saving section above.
    """
    flat_w, has_cw, hid = flatten_blocks_params(blocks_params, local_enhence)
    B, L, C = x.shape
    n_chain = 1 if strategy == "residual" else len(has_cw)
    if backend == "auto":
        # G=1 feasibility against ~physical VMEM (not the grouped-forward
        # budget): the (n_blocks+2)x estimate ignores Mosaic's liveness
        # reuse, so gating it on _BUDGET_BYTES would reject every stage.
        unit = _block_unit_elems(num_heads, L, C, hid) * 4
        over = unit * (n_chain + 2) > 14 * 1024 * 1024
        backend = "xla" if over else "pallas"
    if backend == "xla":
        return layer_math_xla(x, pe, bias, flat_w, has_cw,
                              num_heads=num_heads, mm_dtype=mm_dtype)
    if strategy == "residual":
        return _fused_layer_diff_res(x, pe, bias, flat_w, has_cw, num_heads,
                                     mm_dtype, hid)
    return _fused_layer_diff(x, pe, bias, flat_w, has_cw, num_heads,
                             mm_dtype, hid)
