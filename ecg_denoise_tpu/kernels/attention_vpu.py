"""VPU attention engine for the small-L stages (forward + custom-VJP).

Same math contract as `attention_pallas.fused_attention`:
softmax(q @ k^T + bias) @ v over (B, H, L, D) operands, bias None or
broadcastable (1, H, L, L) (reference model/transformer.py:289-320
MSAttention semantics; q pre-scaled by the caller).

Why a second engine exists (docs/PROFILE_r3.md §4): with head_dim D=4 the
MXU is issue-bound, not FLOP-bound — every formulation of the qk/pv
matmuls (direct, lane-packed, K-packed block-diagonal) costs ~L
row-issues-or-loads per head because either the moving rows or the
stationary loads scale with L while 124 of 128 contraction lanes carry
padding. That floor is ~B*H*L cycles per call and is STAGE-CONSTANT in
RA-LENet (H*L = 512 everywhere), which is exactly the measured 1.2-1.5 ms
per-call plateau. The VPU has no such floor: at 8x128 f32 MACs/cycle the
logits cost D*L^2/1024 cycles per head — 16x below the MXU floor at L=16,
4x at L=64 — so the deep stages (the ones that dominate attention time
INVERSELY to their FLOPs) belong on the VPU.

Formulation rules that make this lower on Mosaic (the round-2/3 traps all
came from violating one of these; see CLAUDE.md):

* No in-kernel relayouts: every operand arrives pre-arranged by XLA so the
  kernel only ever lane-slices, broadcasts, multiplies, reduces and
  lane-concats. q arrives head-packed as (B, H/P, L, P*D) — L on sublanes,
  (head, d) on lanes — which is what makes the per-(p, d) q column a legal
  contiguous lane slice instead of the 3D gather that killed the round-3
  ECG_ATTN_QK=vpu attempt inside the (D, L)-layout MXU kernel.
* k/v arrive as (B, H/P, D, P*L) (head-major lane concat), so per-(p, d)
  rows are contiguous lane slices broadcast over sublanes.
* Logits live as (E, L, P*L) tiles — every lane is a USEFUL (head, m)
  element (no block-diagonal off-block waste, no pad waste: P = 128/L
  fills the lane dim exactly).
* Reshapes only touch leading dims (last two dims never shape-cast).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # flipped by tests on CPU


def vpu_pack_factor(H: int, L: int) -> int:
    """Heads packed per lane tile: fill 128 lanes with P = 128/L heads."""
    if L > 128 or L & (L - 1):
        return 1
    P = min(max(128 // L, 1), H)
    while P > 1 and H % P:
        P //= 2
    return P


# VMEM budget in padded f32 elements for the per-step working set (same
# convention as attention_pallas._MAX_PADDED: PADDED tiles, lane 128 /
# sublane 8 granularity).
_VPU_BUDGET = 1024 * 1024


def _vpu_group_size(B: int, Hg: int, L: int, PL: int, PD: int) -> int:
    # logits + probs + per-block temps ~4x (L, PL) f32, operands q/out
    # (L, max(PD,128)) + k/v (8, PL), all x Hg per batch element.
    per_b = Hg * (4 * L * PL + 2 * L * max(PD, 128) + 4 * 8 * PL)
    for g in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if B % g == 0 and g * per_b <= _VPU_BUDGET:
            return g
    return 1


def _fwd_kernel(P: int, L: int, D: int,
                q_ref, k_ref, v_ref, bias_ref, o_ref):
    # Results stream into o_ref lane-slices per head-block p so no
    # (E, L, 1)-piece list survives to a final concat: each narrow piece
    # pads to 128 lanes in VMEM, and P*D live pieces blew the 16 MB
    # scoped-vmem stack on hardware (runs/r3b_vpu_auto.log).
    G, Hg, _, PD = q_ref.shape
    E = G * Hg
    PL = P * L
    q = q_ref[:].reshape(E, L, PD).astype(jnp.float32)
    k = k_ref[:].reshape(E, D, PL).astype(jnp.float32)
    v = v_ref[:].reshape(E, D, PL)
    if bias_ref is not None:
        bias = bias_ref[:].astype(jnp.float32)  # (Hg, L, PL)
    for p in range(P):
        # logits block (E, L, L): sum_d q[:, :, p*D+d] (x) k[:, d, pL:pL+L]
        acc = None
        for d in range(D):
            qc = jnp.broadcast_to(q[:, :, p * D + d:p * D + d + 1], (E, L, L))
            kr = k[:, d:d + 1, p * L:(p + 1) * L]  # (E, 1, L)
            term = qc * kr
            acc = term if acc is None else acc + term
        if bias_ref is not None:
            bp = bias[:, :, p * L:(p + 1) * L]  # (Hg, L, L)
            acc = (acc.reshape(G, Hg, L, L) + bp[None]).reshape(E, L, L)
        m = jnp.max(acc, axis=-1, keepdims=True)
        e = jnp.exp(acc - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        probs = probs.astype(v.dtype)
        rows = [jnp.sum(probs * v[:, d:d + 1, p * L:(p + 1) * L],
                        axis=-1, keepdims=True) for d in range(D)]
        blk = jnp.concatenate(rows, axis=-1)  # (E, L, D)
        o_ref[:, :, :, p * D:(p + 1) * D] = blk.reshape(
            G, Hg, L, D).astype(o_ref.dtype)


def _bwd_kernel(P: int, L: int, D: int,
                q_ref, k_ref, v_ref, bias_ref, g_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref):
    b = pl.program_id(0)
    G, Hg, _, PD = q_ref.shape
    E = G * Hg
    PL = P * L
    q = q_ref[:].reshape(E, L, PD).astype(jnp.float32)
    k = k_ref[:].reshape(E, D, PL).astype(jnp.float32)
    v = v_ref[:].reshape(E, D, PL).astype(jnp.float32)
    gy = g_ref[:].reshape(E, L, PD).astype(jnp.float32)
    if bias_ref is not None:
        bias = bias_ref[:].astype(jnp.float32)

    if dbias_ref is not None:
        @pl.when(b == 0)
        def _():
            dbias_ref[:] = jnp.zeros_like(dbias_ref[:])

    # Per-block streaming stores (see _fwd_kernel note on scoped vmem).
    for p in range(P):
        acc = None
        dp = None
        for d in range(D):
            qc = jnp.broadcast_to(q[:, :, p * D + d:p * D + d + 1], (E, L, L))
            kr = k[:, d:d + 1, p * L:(p + 1) * L]
            term = qc * kr
            acc = term if acc is None else acc + term
            # dp[l, m] += g[l, (p,d)] * v[d, (p,m)]
            gc = jnp.broadcast_to(gy[:, :, p * D + d:p * D + d + 1], (E, L, L))
            vr = v[:, d:d + 1, p * L:(p + 1) * L]
            dterm = gc * vr
            dp = dterm if dp is None else dp + dterm
        if bias_ref is not None:
            bp = bias[:, :, p * L:(p + 1) * L]
            acc = (acc.reshape(G, Hg, L, L) + bp[None]).reshape(E, L, L)
        m = jnp.max(acc, axis=-1, keepdims=True)
        e = jnp.exp(acc - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)  # (E, L, L) f32
        ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
        if dbias_ref is not None:
            dbias_ref[:, :, p * L:(p + 1) * L] += jnp.sum(
                ds.reshape(G, Hg, L, L), axis=0).astype(dbias_ref.dtype)
        # dq[l, (p,d)] = sum_m ds[l, m] k[d, m]
        dq_rows = [jnp.sum(ds * k[:, d:d + 1, p * L:(p + 1) * L],
                           axis=-1, keepdims=True) for d in range(D)]
        dq_ref[:, :, :, p * D:(p + 1) * D] = jnp.concatenate(
            dq_rows, axis=-1).reshape(G, Hg, L, D).astype(dq_ref.dtype)
        dk_rows = []
        dv_rows = []
        for d in range(D):
            qc = jnp.broadcast_to(q[:, :, p * D + d:p * D + d + 1], (E, L, L))
            gc = jnp.broadcast_to(gy[:, :, p * D + d:p * D + d + 1], (E, L, L))
            # dk[d, (p,m)] = sum_l ds[l, m] q[l, (p,d)]  (sublane reduce)
            dk_rows.append(jnp.sum(ds * qc, axis=1, keepdims=True))
            # dv[d, (p,m)] = sum_l probs[l, m] g[l, (p,d)]
            dv_rows.append(jnp.sum(probs * gc, axis=1, keepdims=True))
        dk_ref[:, :, :, p * L:(p + 1) * L] = jnp.concatenate(
            dk_rows, axis=1).reshape(G, Hg, D, L).astype(dk_ref.dtype)
        dv_ref[:, :, :, p * L:(p + 1) * L] = jnp.concatenate(
            dv_rows, axis=1).reshape(G, Hg, D, L).astype(dv_ref.dtype)


def _pack_q(q, B, H, L, D, P):
    # (B, H, L, D) -> (B, H/P, L, P*D): lane index p*D + d.
    return (q.reshape(B, H // P, P, L, D)
            .transpose(0, 1, 3, 2, 4)
            .reshape(B, H // P, L, P * D))


def _unpack_q(o, B, H, L, D, P):
    return (o.reshape(B, H // P, L, P, D)
            .transpose(0, 1, 3, 2, 4)
            .reshape(B, H, L, D))


def _pack_kv(a, B, H, L, D, P):
    # (B, H, L, D) -> (B, H/P, D, P*L): lane index p*L + m.
    return a.reshape(B, H // P, P * L, D).transpose(0, 1, 3, 2)


def _unpack_kv(a, B, H, L, D, P):
    return a.transpose(0, 1, 3, 2).reshape(B, H, L, D)


def _pack_bias(bias, H, L, P):
    # (1/H, H, L, L) -> (H/P, L, P*L)
    return (bias.reshape(H // P, P, L, L)
            .transpose(0, 2, 1, 3)
            .reshape(H // P, L, P * L))


def _unpack_bias(bias, H, L, P):
    # (H/P, L, P*L) -> (H, L, L)
    return (bias.reshape(H // P, L, P, L)
            .transpose(0, 2, 1, 3)
            .reshape(H, L, L))


def _specs(G, Hg, a, b):
    return pl.BlockSpec((G, Hg, a, b), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _bias_spec(Hg, L, PL):
    return pl.BlockSpec((Hg, L, PL), lambda i: (0, 0, 0),
                        memory_space=pltpu.VMEM)


def _cost(B, H, L, D, mult):
    return pl.CostEstimate(
        flops=mult * B * H * (2 * L * L * D + L * L),
        bytes_accessed=B * H * L * D * 4 * 4,
        transcendentals=B * H * L * L,
    )


def _fwd_impl(q, k, v, bias):
    B, H, L, D = q.shape
    P = vpu_pack_factor(H, L)
    Hg, PD, PL = H // P, P * D, P * L
    qp = _pack_q(q, B, H, L, D, P)
    kp = _pack_kv(k, B, H, L, D, P)
    vp = _pack_kv(v, B, H, L, D, P)
    has_bias = bias is not None
    bp = _pack_bias(bias.reshape(H, L, L), H, L, P) if has_bias else None
    G = _vpu_group_size(B, Hg, L, PL, PD)
    kernel = functools.partial(_fwd_kernel, P, L, D)
    if not has_bias:
        kernel = functools.partial(
            lambda kf, qr, kr, vr, orf: kf(qr, kr, vr, None, orf), kernel)
    in_specs = [_specs(G, Hg, L, PD), _specs(G, Hg, D, PL),
                _specs(G, Hg, D, PL)] + ([_bias_spec(Hg, L, PL)]
                                         if has_bias else [])
    args = (qp, kp, vp) + ((bp,) if has_bias else ())
    out = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=_specs(G, Hg, L, PD),
        out_shape=jax.ShapeDtypeStruct((B, Hg, L, PD), q.dtype),
        cost_estimate=_cost(B, H, L, D, 2),
        interpret=_INTERPRET,
    )(*args)
    return _unpack_q(out, B, H, L, D, P)


def _bwd_impl(q, k, v, bias, g):
    B, H, L, D = q.shape
    P = vpu_pack_factor(H, L)
    Hg, PD, PL = H // P, P * D, P * L
    qp = _pack_q(q, B, H, L, D, P)
    gp = _pack_q(g, B, H, L, D, P)
    kp = _pack_kv(k, B, H, L, D, P)
    vp = _pack_kv(v, B, H, L, D, P)
    has_bias = bias is not None
    bp = _pack_bias(bias.reshape(H, L, L), H, L, P) if has_bias else None
    G = _vpu_group_size(B, Hg, L, PL, PD)
    if G > 1:
        G //= 2  # backward working set is ~2x the forward's
    kernel = functools.partial(_bwd_kernel, P, L, D)
    if not has_bias:
        kernel = functools.partial(
            lambda kf, qr, kr, vr, gr, dqr, dkr, dvr: kf(
                qr, kr, vr, None, gr, dqr, dkr, dvr, None), kernel)
    in_specs = [_specs(G, Hg, L, PD), _specs(G, Hg, D, PL),
                _specs(G, Hg, D, PL)] \
        + ([_bias_spec(Hg, L, PL)] if has_bias else []) \
        + [_specs(G, Hg, L, PD)]
    args = (qp, kp, vp) + ((bp,) if has_bias else ()) + (gp,)
    out_specs = [_specs(G, Hg, L, PD), _specs(G, Hg, D, PL),
                 _specs(G, Hg, D, PL)]
    out_shape = [jax.ShapeDtypeStruct((B, Hg, L, PD), q.dtype),
                 jax.ShapeDtypeStruct((B, Hg, D, PL), q.dtype),
                 jax.ShapeDtypeStruct((B, Hg, D, PL), q.dtype)]
    if has_bias:
        out_specs.append(_bias_spec(Hg, L, PL))
        out_shape.append(jax.ShapeDtypeStruct((Hg, L, PL), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=_cost(B, H, L, D, 5),
        interpret=_INTERPRET,
    )(*args)
    if has_bias:
        dqp, dkp, dvp, dbp = outs
        dbias = _unpack_bias(dbp, H, L, P).reshape(1, H, L, L).astype(
            bias.dtype)
    else:
        dqp, dkp, dvp = outs
        dbias = None
    dq = _unpack_q(dqp, B, H, L, D, P)
    dk = _unpack_kv(dkp, B, H, L, D, P)
    dv = _unpack_kv(dvp, B, H, L, D, P)
    return dq, dk, dv, dbias


# --- per-window R-peak bias (VPU engine variant) ---------------------------
#
# Same factorization as attention_pallas.fused_attention_rpos (reference
# model/transformer.py:508-558 semantics): bias_b[l, m] = toep[l, m] *
# in_b[l] * in_b[m], with in_b the [off_b, off_b + W) interval indicator.
# In the (L, P*L) packed layout the m-mask lives on lanes (lane % L) and
# the l-mask on sublanes — both from broadcasted_iota + f32 offsets, so
# the (B, H, L, L) bias never exists in any memory space.


def _rpos_masks(off_ref, W, G, L, PL):
    pos_m = (jax.lax.broadcasted_iota(jnp.int32, (G, 1, PL), 2) % L).astype(
        jnp.float32)
    pos_l = jax.lax.broadcasted_iota(jnp.int32, (G, L, 1), 1).astype(
        jnp.float32)
    off = off_ref[:].reshape(G, 1, 1).astype(jnp.float32)
    m_m = ((pos_m >= off) & (pos_m < off + W)).astype(jnp.float32)
    m_l = ((pos_l >= off) & (pos_l < off + W)).astype(jnp.float32)
    return m_l, m_m  # (G, L, 1), (G, 1, PL)


def _rpos_fwd_kernel(P, L, D, W, q_ref, k_ref, v_ref, toep_ref, off_ref,
                     o_ref):
    G, Hg, _, PD = q_ref.shape
    E = G * Hg
    PL = P * L
    q = q_ref[:].reshape(E, L, PD).astype(jnp.float32)
    k = k_ref[:].reshape(E, D, PL).astype(jnp.float32)
    v = v_ref[:].reshape(E, D, PL)
    toep = toep_ref[:].astype(jnp.float32)  # (Hg, L, PL)
    m_l, m_m = _rpos_masks(off_ref, W, G, L, PL)
    for p in range(P):
        acc = None
        for d in range(D):
            qc = jnp.broadcast_to(q[:, :, p * D + d:p * D + d + 1], (E, L, L))
            kr = k[:, d:d + 1, p * L:(p + 1) * L]
            term = qc * kr
            acc = term if acc is None else acc + term
        tp = toep[:, :, p * L:(p + 1) * L]  # (Hg, L, L)
        gate = m_l * m_m[:, :, p * L:(p + 1) * L]  # (G, L, L)
        acc = (acc.reshape(G, Hg, L, L)
               + tp[None] * gate[:, None]).reshape(E, L, L)
        m = jnp.max(acc, axis=-1, keepdims=True)
        e = jnp.exp(acc - m)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        rows = [jnp.sum(probs * v[:, d:d + 1, p * L:(p + 1) * L],
                        axis=-1, keepdims=True) for d in range(D)]
        o_ref[:, :, :, p * D:(p + 1) * D] = jnp.concatenate(
            rows, axis=-1).reshape(G, Hg, L, D).astype(o_ref.dtype)


def _rpos_bwd_kernel(P, L, D, W, q_ref, k_ref, v_ref, toep_ref, off_ref,
                     g_ref, dq_ref, dk_ref, dv_ref, dtoep_ref):
    b = pl.program_id(0)
    G, Hg, _, PD = q_ref.shape
    E = G * Hg
    PL = P * L
    q = q_ref[:].reshape(E, L, PD).astype(jnp.float32)
    k = k_ref[:].reshape(E, D, PL).astype(jnp.float32)
    v = v_ref[:].reshape(E, D, PL).astype(jnp.float32)
    gy = g_ref[:].reshape(E, L, PD).astype(jnp.float32)
    toep = toep_ref[:].astype(jnp.float32)
    m_l, m_m = _rpos_masks(off_ref, W, G, L, PL)

    @pl.when(b == 0)
    def _():
        dtoep_ref[:] = jnp.zeros_like(dtoep_ref[:])

    # Per-block streaming stores (see _fwd_kernel note on scoped vmem).
    for p in range(P):
        acc = None
        dp = None
        for d in range(D):
            qc = jnp.broadcast_to(q[:, :, p * D + d:p * D + d + 1], (E, L, L))
            kr = k[:, d:d + 1, p * L:(p + 1) * L]
            term = qc * kr
            acc = term if acc is None else acc + term
            gc = jnp.broadcast_to(gy[:, :, p * D + d:p * D + d + 1], (E, L, L))
            vr = v[:, d:d + 1, p * L:(p + 1) * L]
            dterm = gc * vr
            dp = dterm if dp is None else dp + dterm
        tp = toep[:, :, p * L:(p + 1) * L]
        gate = m_l * m_m[:, :, p * L:(p + 1) * L]  # (G, L, L)
        acc = (acc.reshape(G, Hg, L, L)
               + tp[None] * gate[:, None]).reshape(E, L, L)
        m = jnp.max(acc, axis=-1, keepdims=True)
        e = jnp.exp(acc - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
        # d toep gets the mask-gated ds, summed over this step's G.
        dtoep_ref[:, :, p * L:(p + 1) * L] += jnp.sum(
            ds.reshape(G, Hg, L, L) * gate[:, None], axis=0).astype(
            dtoep_ref.dtype)
        dq_rows = [jnp.sum(ds * k[:, d:d + 1, p * L:(p + 1) * L],
                           axis=-1, keepdims=True) for d in range(D)]
        dq_ref[:, :, :, p * D:(p + 1) * D] = jnp.concatenate(
            dq_rows, axis=-1).reshape(G, Hg, L, D).astype(dq_ref.dtype)
        dk_rows = []
        dv_rows = []
        for d in range(D):
            qc = jnp.broadcast_to(q[:, :, p * D + d:p * D + d + 1], (E, L, L))
            gc = jnp.broadcast_to(gy[:, :, p * D + d:p * D + d + 1], (E, L, L))
            dk_rows.append(jnp.sum(ds * qc, axis=1, keepdims=True))
            dv_rows.append(jnp.sum(probs * gc, axis=1, keepdims=True))
        dk_ref[:, :, :, p * L:(p + 1) * L] = jnp.concatenate(
            dk_rows, axis=1).reshape(G, Hg, D, L).astype(dk_ref.dtype)
        dv_ref[:, :, :, p * L:(p + 1) * L] = jnp.concatenate(
            dv_rows, axis=1).reshape(G, Hg, D, L).astype(dv_ref.dtype)


def _off_spec(G):
    # (B, 1, 1) so the block's last two dims equal the array's (Mosaic
    # block-shape rule; see attention_pallas._off_spec).
    return pl.BlockSpec((G, 1, 1), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _rpos_fwd_impl(q, k, v, toep, W, offsets):
    B, H, L, D = q.shape
    P = vpu_pack_factor(H, L)
    Hg, PD, PL = H // P, P * D, P * L
    qp = _pack_q(q, B, H, L, D, P)
    kp = _pack_kv(k, B, H, L, D, P)
    vp = _pack_kv(v, B, H, L, D, P)
    tp = _pack_bias(toep.reshape(H, L, L), H, L, P)
    off = offsets.reshape(B, 1, 1).astype(jnp.float32)
    G = _vpu_group_size(B, Hg, L, PL, PD)
    kernel = functools.partial(_rpos_fwd_kernel, P, L, D, W)
    out = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[_specs(G, Hg, L, PD), _specs(G, Hg, D, PL),
                  _specs(G, Hg, D, PL), _bias_spec(Hg, L, PL), _off_spec(G)],
        out_specs=_specs(G, Hg, L, PD),
        out_shape=jax.ShapeDtypeStruct((B, Hg, L, PD), q.dtype),
        cost_estimate=_cost(B, H, L, D, 2),
        interpret=_INTERPRET,
    )(qp, kp, vp, tp, off)
    return _unpack_q(out, B, H, L, D, P)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def vpu_attention_rpos(q, k, v, toep, W: int, offsets=None):
    """Per-window R-peak biased attention on the VPU engine.

    Contract identical to attention_pallas.fused_attention_rpos: q
    pre-scaled; toep (1, H, L, L); offsets (B,) f32 window starts; W
    static. Gradients flow to q/k/v/toep; offsets get zero cotangents.
    """
    return _rpos_fwd_impl(q, k, v, toep, W, offsets)


def _rpos_vjp_fwd(q, k, v, toep, W, offsets):
    return _rpos_fwd_impl(q, k, v, toep, W, offsets), (q, k, v, toep, offsets)


def _rpos_vjp_bwd(W, res, g):
    q, k, v, toep, offsets = res
    B, H, L, D = q.shape
    P = vpu_pack_factor(H, L)
    Hg, PD, PL = H // P, P * D, P * L
    qp = _pack_q(q, B, H, L, D, P)
    gp = _pack_q(g, B, H, L, D, P)
    kp = _pack_kv(k, B, H, L, D, P)
    vp = _pack_kv(v, B, H, L, D, P)
    tp = _pack_bias(toep.reshape(H, L, L), H, L, P)
    off = offsets.reshape(B, 1, 1).astype(jnp.float32)
    G = _vpu_group_size(B, Hg, L, PL, PD)
    if G > 1:
        G //= 2
    kernel = functools.partial(_rpos_bwd_kernel, P, L, D, W)
    outs = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[_specs(G, Hg, L, PD), _specs(G, Hg, D, PL),
                  _specs(G, Hg, D, PL), _bias_spec(Hg, L, PL), _off_spec(G),
                  _specs(G, Hg, L, PD)],
        out_specs=[_specs(G, Hg, L, PD), _specs(G, Hg, D, PL),
                   _specs(G, Hg, D, PL), _bias_spec(Hg, L, PL)],
        out_shape=[jax.ShapeDtypeStruct((B, Hg, L, PD), q.dtype),
                   jax.ShapeDtypeStruct((B, Hg, D, PL), q.dtype),
                   jax.ShapeDtypeStruct((B, Hg, D, PL), q.dtype),
                   jax.ShapeDtypeStruct((Hg, L, PL), jnp.float32)],
        cost_estimate=_cost(B, H, L, D, 5),
        interpret=_INTERPRET,
    )(qp, kp, vp, tp, off, gp)
    dqp, dkp, dvp, dtp = outs
    dq = _unpack_q(dqp, B, H, L, D, P)
    dk = _unpack_kv(dkp, B, H, L, D, P)
    dv = _unpack_kv(dvp, B, H, L, D, P)
    dtoep = _unpack_bias(dtp, H, L, P).reshape(1, H, L, L).astype(toep.dtype)
    return dq, dk, dv, dtoep, jnp.zeros_like(offsets)


vpu_attention_rpos.defvjp(_rpos_vjp_fwd, _rpos_vjp_bwd)


@jax.custom_vjp
def vpu_attention(q, k, v, bias: Optional[jnp.ndarray] = None):
    """softmax(q @ k^T + bias) @ v on the VPU (small-L engine).

    Contract identical to attention_pallas.fused_attention: q pre-scaled,
    bias None or (1, H, L, L).
    """
    return _fwd_impl(q, k, v, bias)


def _vjp_fwd(q, k, v, bias):
    return _fwd_impl(q, k, v, bias), (q, k, v, bias)


def _vjp_bwd(res, g):
    q, k, v, bias = res
    return _bwd_impl(q, k, v, bias, g)


vpu_attention.defvjp(_vjp_fwd, _vjp_bwd)


def vpu_wanted(L: int, H: int) -> bool:
    """Engine dispatch: ECG_ATTN_ENGINE = auto (VPU for L <= maxl) | mxu |
    vpu. Read at trace time so benches can A/B without code edits.

    Default is mxu until the chip measurement lands (flip to auto then)."""
    eng = os.environ.get("ECG_ATTN_ENGINE", "mxu")
    if eng == "mxu":
        return False
    maxl = int(os.environ.get("ECG_ATTN_VPU_MAXL", "64"))
    if eng == "vpu":
        maxl = 256
    return 8 <= L <= maxl and not L & (L - 1)
