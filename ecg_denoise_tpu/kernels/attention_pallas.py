"""Fused biased-attention Pallas kernel (forward + custom-VJP backward).

Replaces the XLA path in `ops.attention.multi_head_attention` behind the
same interface: softmax(q @ k^T + bias) @ v over (B, H, L, D) operands with
an additive (1, H, L, L) bias (the R-wave rel-pos bias,
reference model/transformer.py:289-320 MSAttention math).

TPU-first design notes (see /opt/skills/guides/pallas_guide.md):

* RA-LENet attention is TINY per head (L <= 256, D = 4, survey §7 risks:
  head_dim far below the 128x128 MXU tile). The fusion win here is memory
  traffic, not FLOPs: one kernel pass per (b, h) keeps the (L, L) logits,
  softmax and the weighted sum entirely in VMEM — the (B, H, L, L)
  probability tensor never exists in HBM in either direction.
* Grid = (B, H), sequential on TPU. The bias gradient needs a sum over the
  batch axis; the TPU grid's sequential execution lets the dbias output
  block (index_map ignoring `b`) act as an accumulator: zeroed at b == 0,
  `+=` on every step — no extra XLA reduction pass.
* All matmuls request preferred_element_type=float32 so bf16 inputs still
  accumulate in f32 on the MXU; softmax is computed in f32.
* The backward kernel recomputes the probabilities from (q, k, bias)
  instead of saving them (flash-attention-style rematerialisation): HBM
  residuals stay O(B*H*L*D), not O(B*H*L^2).

Whole windows fit in VMEM (worst case L=256: a handful of 256x256 f32
buffers, ~1.5 MB), so no inner blocking is needed — blockwise tiling only
becomes relevant for the 12-lead/LUDB long-window variants, which still fit.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # flipped by tests on CPU


def _softmax_f32(logits):
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    q = q_ref[0, 0].astype(jnp.float32)  # (L, D)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # q @ k^T: (L, L)
    if bias_ref is not None:
        logits = logits + bias_ref[0].astype(jnp.float32)
    probs = _softmax_f32(logits).astype(v.dtype)
    o_ref[0, 0] = jnp.dot(
        probs, v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref):
    b = pl.program_id(0)
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    g = g_ref[0, 0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if bias_ref is not None:
        logits = logits + bias_ref[0].astype(jnp.float32)
    p = _softmax_f32(logits)  # (L, L)

    # dv = p^T @ g ; dp = g @ v^T ; ds = p * (dp - rowsum(dp * p))
    dv = jax.lax.dot_general(
        p, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)
    if dbias_ref is not None:
        # Sequential-grid accumulation over the batch axis.
        @pl.when(b == 0)
        def _():
            dbias_ref[0] = jnp.zeros_like(dbias_ref[0])

        dbias_ref[0] += ds.astype(dbias_ref.dtype)


def _head_spec(L, D):
    return pl.BlockSpec((1, 1, L, D), lambda b, h: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)


def _bias_spec(L):
    return pl.BlockSpec((1, L, L), lambda b, h: (h, 0, 0),
                        memory_space=pltpu.VMEM)


def _fwd(q, k, v, bias):
    B, H, L, D = q.shape
    has_bias = bias is not None
    kernel = _fwd_kernel if has_bias else (
        lambda qr, kr, vr, orf: _fwd_kernel(qr, kr, vr, None, orf)
    )
    in_specs = [_head_spec(L, D)] * 3 + ([_bias_spec(L)] if has_bias else [])
    args = (q, k, v) + ((bias.reshape(H, L, L),) if has_bias else ())
    return pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=in_specs,
        out_specs=_head_spec(L, D),
        out_shape=jax.ShapeDtypeStruct((B, H, L, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * (2 * L * L * D + L * L),
            bytes_accessed=q.size * 4 * 4,
            transcendentals=B * H * L * L,
        ),
        interpret=_INTERPRET,
    )(*args)


def _bwd(q, k, v, bias, g):
    B, H, L, D = q.shape
    has_bias = bias is not None
    kernel = _bwd_kernel if has_bias else (
        lambda qr, kr, vr, gr, dqr, dkr, dvr: _bwd_kernel(
            qr, kr, vr, None, gr, dqr, dkr, dvr, None
        )
    )
    in_specs = [_head_spec(L, D)] * 3 + ([_bias_spec(L)] if has_bias else []) \
        + [_head_spec(L, D)]
    args = (q, k, v) + ((bias.reshape(H, L, L),) if has_bias else ()) + (g,)
    out_specs = [_head_spec(L, D)] * 3
    out_shape = [jax.ShapeDtypeStruct((B, H, L, D), q.dtype)] * 3
    if has_bias:
        out_specs.append(_bias_spec(L))
        out_shape.append(jax.ShapeDtypeStruct((H, L, L), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * (5 * L * L * D + 3 * L * L),
            bytes_accessed=q.size * 4 * 8,
            transcendentals=B * H * L * L,
        ),
        interpret=_INTERPRET,
    )(*args)
    if has_bias:
        dq, dk, dv, dbias = outs
        return dq, dk, dv, dbias.reshape(1, H, L, L).astype(bias.dtype)
    dq, dk, dv = outs
    return dq, dk, dv, None


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_attention(q, k, v, bias: Optional[jnp.ndarray] = None):
    """softmax(q @ k^T + bias) @ v, fully fused in VMEM per (b, h).

    q is pre-scaled by the caller (same contract as
    ops.attention.multi_head_attention). bias: (1, H, L, L) or None.
    """
    return _fwd(q, k, v, bias)


def _fused_fwd(q, k, v, bias):
    return _fwd(q, k, v, bias), (q, k, v, bias)


def _fused_bwd(res, g):
    q, k, v, bias = res
    return _bwd(q, k, v, bias, g)


fused_attention.defvjp(_fused_fwd, _fused_bwd)
