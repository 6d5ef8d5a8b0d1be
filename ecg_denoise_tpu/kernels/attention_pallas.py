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
* The backward kernel recomputes the unnormalized probabilities from
  (q, k, bias) instead of saving them (flash-attention-style
  rematerialisation): HBM residuals stay O(B*H*L*D), not O(B*H*L^2).
  Two further flash-style moves (round-3j) delete most of its VPU
  reduction work: the forward's FOLDED softmax sums ride along as an
  O(B*H*L) residual (no sum tree, no divide — only the max tree is
  recomputed; since the round-3f transposed refactor the recomputed
  logits come from swapped-operand dots, so the recompute is exact up
  to that ~1-ulp dot rounding, see _exp_unnorm_t — the saved folded
  sums are consistent to rounding, not bitwise), and the
  softmax-jacobian row term uses the
  delta identity c[l] = sum_d g[d,l]*o[d,l] against the saved forward
  output (no dp*p reduction tree). Round-3f on top: the whole flash
  branch is computed TRANSPOSED (logits^T = k·q, dp^T = v·g — swapped
  dot operands cost nothing) so the per-row scalars c and 1/s broadcast
  from their native lane-major layout; the previous identity-matmul
  lane->sublane transpose and its E-unrolled slice loop are gone.

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

_INTERPRET = False  # force-flipped by tests; CPU auto-interprets (_interp)


def _interp() -> bool:
    """Interpret-mode switch for every pallas_call in this module.

    True when tests force it (_INTERPRET) or when the active backend is
    CPU — Mosaic only lowers for TPU, and the virtual-device mesh paths
    (tests/conftest.py, __graft_entry__.dryrun_multichip) run the kernel
    path on CPU. Trace-time query; the backend is already fixed by then.
    """
    return _INTERPRET or jax.default_backend() == "cpu"


def _data_mesh(batch: Optional[int] = None):
    """The ambient `with mesh:` mesh, iff the kernels should shard over it.

    pallas_call does NOT compose with the jit-SPMD partitioner the way
    plain HLO does (a Mosaic custom call has no partitioning rule — XLA
    would replicate its operands), so when a mesh with a 'data' axis is
    active the public wrappers below route through explicit
    `jax.shard_map` twins: batch-sharded operands, replicated bias/toep,
    and a hand-placed psum on the bias/toep cotangents (shard_map with
    check_vma=False does NOT auto-reduce replicated-input gradients —
    the round-3 packed-engine lesson; pallas out_shapes carry no vma, so
    check_vma must stay off). Returns None (single-device path) when no
    mesh is active or the batch doesn't divide the 'data' axis.

    jit caches are resource-env-keyed: the same jitted fn retraces when
    the ambient mesh changes, so the dispatch below is safe under reuse.
    """
    from jax._src import mesh as mesh_lib

    m = mesh_lib.thread_resources.env.physical_mesh
    if m.empty or "data" not in m.axis_names:
        return None
    if batch is not None and batch % m.shape["data"] != 0:
        return None
    return m


def _softmax_f32(logits):
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _maxfree() -> bool:
    """ECG_ATTN_MAXFREE=1 drops the softmax's per-row max lane-tree
    (experiment knob, read at trace time; see _exp_unnorm)."""
    import os

    return os.environ.get("ECG_ATTN_MAXFREE", "0") == "1"


_MAXFREE_CAP = 60.0  # e^60 ~ 1.1e26: far below f32/bf16 overflow even after
#                      the 128-lane pv accumulation against O(10) values.


def _exp_unnorm(logits):
    """Unnormalized softmax numerator e (f32) from f32 logits.

    Default: subtract the per-row max (overflow-safe for any input). With
    the normalizer FOLDED into the pv matmul, exp(x - c)/sum_m exp(x - c)
    is exactly softmax for ANY per-row constant c — the max subtraction is
    pure overflow protection, paid as the kernel's last remaining lane-tree
    reduction (fwd AND both flash backwards recompute it). ECG_ATTN_MAXFREE
    replaces it with a VPU-elementwise cap min(x, 60): bit-exact whenever
    no logit exceeds 60 (q@k/sqrt(D) scores in trained RA-LENets are O(10));
    beyond the cap the weights saturate instead of overflowing. Rows whose
    every logit is < ~-87 underflow to all-zero — callers guard the 0/0
    with a denominator floor (the default path keeps its bit-identical
    unguarded divide)."""
    if _maxfree():
        return jnp.exp(jnp.minimum(logits, _MAXFREE_CAP))
    m = jnp.max(logits, axis=-1, keepdims=True)
    return jnp.exp(logits - m)


def _guard_den(den):
    """Denominator floor for the maxfree path (see _exp_unnorm); identity
    on the default path so its numerics stay bit-identical."""
    return jnp.maximum(den, 1e-37) if _maxfree() else den


def _exp_unnorm_t(logits_t):
    """_exp_unnorm for TRANSPOSED logits (lt[m, l]): the softmax row l is
    a lane column, so the protective max reduces over the SUBLANE axis —
    same values as the forward's per-row max, so the saved folded sums
    stay consistent (max is exact; the only divergence is <=1 ulp of f32
    from the swapped-operand dot accumulation order)."""
    if _maxfree():
        return jnp.exp(jnp.minimum(logits_t, _MAXFREE_CAP))
    m = jnp.max(logits_t, axis=-2, keepdims=True)
    return jnp.exp(logits_t - m)


def _bmm(a, b, contract, batch=((0,), (0,)), precision=None):
    """Batched (over heads) matmul with f32 accumulation.

    Mosaic's DEFAULT precision rounds f32 INPUTS to bf16 (single MXU
    pass) — measured on v5e: med rel error 2.4e-3, bit-identical to a
    host bf16-rounding prediction (runs/probe_precision.log). Pass
    precision=HIGHEST where f32 operands must keep full precision.
    """
    return jax.lax.dot_general(
        a, b, (contract, batch), preferred_element_type=jnp.float32,
        precision=precision,
    )


def _pv_precision(dtype):
    """Precision for the pv matmul that carries the folded softmax sum.

    The ones-row fold makes the normalizer a matmul output; at DEFAULT
    precision its bf16 input rounding becomes a CORRELATED per-row scale
    error (~1e-3) on the whole output — unlike the random-signed
    elementwise matmul errors, it never cancels in aggregates, which is
    what broke the on-chip value-level tests after the fold
    (runs/tpu_kernel_tests_r3b.log vs runs/probe_precision.log: fold at
    HIGHEST is med 9e-7, at DEFAULT med 1.7e-3). bf16 operands are
    MXU-native single-pass, so HIGHEST only costs on the f32 path.
    """
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def _qk_vpu() -> bool:
    """Route the K=4 logits contraction through unrolled VPU broadcast-MACs
    instead of the MXU (experiment flag; head_dim=4 leaves the MXU ~97%
    idle per pass, so the VPU can win despite its lower peak)."""
    import os

    return os.environ.get("ECG_ATTN_QK", "") == "vpu"


def _logits(q, k):
    """(E, D, L) x (E, D, M) -> (E, L, M) f32 logits, contracting D."""
    if not _qk_vpu():
        return _bmm(q, k, ((1,), (1,)))
    D = q.shape[1]
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    acc = qf[:, 0, :, None] * kf[:, 0, None, :]
    for d in range(1, D):
        acc += qf[:, d, :, None] * kf[:, d, None, :]
    return acc


# VMEM working-set budget in PADDED (G*H, L, L) f32 elements: the lane dim
# pads to 128 and the sublane dim to 8, so at L=16 the physical buffer is
# 8x the logical one — budgeting logical elements OOMed the 16 MB scoped
# vmem on v5e (21 MB at ~2M padded elements). 0.75M padded elements keeps
# the full per-step working set (logits + probs + softmax temporaries +
# operand casts) around half the limit.
_MAX_PADDED = 768 * 1024


def _max_padded() -> int:
    """VMEM working-set budget in padded f32 elements (see _MAX_PADDED).

    Overridable via ECG_ATTN_VMEM_BUDGET for on-chip sweeps: the round-3
    iso profile measured ~5us of fixed per-grid-step cost dominating every
    stage, so throughput is nearly proportional to G until VMEM runs out.
    """
    import os

    v = os.environ.get("ECG_ATTN_VMEM_BUDGET")
    return int(v) if v else _MAX_PADDED


def _padded_hll(H: int, L: int) -> int:
    sub = -(-L // 8) * 8
    lane = max(L, 128)
    return H * sub * lane


def _group_size(B: int, H: int, L: int) -> int:
    """Largest divisor of B keeping the (G*H, L, L) working set in budget.

    Grouping G batch elements per grid step amortises per-step overheads
    that dominate at these tiny head sizes (L<=256, D=4): measured on v5e,
    per-(b,h) grid 7.3k w/s -> per-b 19.3k w/s -> grouped better still.
    """
    budget = _max_padded()
    for g in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if B % g == 0 and g * _padded_hll(H, L) <= budget:
            return g
    return 1


def _ablate_mode() -> str:
    """Timing-attribution knob (numerics change; benchmarking only):
    ECG_ATTN_ABLATE = dma | noqk | nosm | nopv skips one kernel phase so
    iso timings attribute the per-call cost on hardware."""
    import os

    return os.environ.get("ECG_ATTN_ABLATE", "")


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, s_ref=None, mode=""):
    # G batch elements x all H heads per grid step, as one batched
    # (G*H, L, L) contraction. Operands arrive in (G, H, D, L) layout so the
    # LANE dim is L (no padding at L >= 128) — the natural (..., L, D=4)
    # layout pads 4 -> 128 lanes, a 32x HBM-traffic blowup. Matmuls keep
    # native dtype (bf16 hits the MXU fast path) with f32 accumulation;
    # softmax runs in f32.
    #
    # s_ref (optional, custom-VJP fwd only): the folded softmax sums
    # (E, 1, L) are saved as a residual so the flash-style backward never
    # re-reduces them (see _bwd_kernel).
    G, H, D, L = q_ref.shape
    if mode == "dma":
        o_ref[:] = q_ref[:]
        if s_ref is not None:
            s_ref[:] = jnp.ones_like(s_ref[:])
        return
    q = q_ref[:].reshape(G * H, D, L)
    k = k_ref[:].reshape(G * H, D, L)
    v = v_ref[:].reshape(G * H, D, L)
    if mode == "noqk":
        logits = jnp.broadcast_to(k[:, :1, :].astype(jnp.float32),
                                  (G * H, L, L))
    else:
        logits = _logits(q, k)  # contract D -> (G*H, L, L) f32
    if bias_ref is not None:
        bias = bias_ref[:].astype(jnp.float32)  # (H, L, L)
        logits = (logits.reshape(G, H, L, L) + bias).reshape(G * H, L, L)
    if mode == "nosm":
        probs = (logits * 1e-3).astype(v.dtype)
    else:
        # Softmax with the SUM and DIVIDE folded into the pv matmul (the
        # r3c ablation attributed ~2 ms/stage to softmax, mostly its two
        # 128-lane tree reductions + the full-tile divide): augment v with
        # a ones row so the pv contraction emits sum_m e[l, m] as a free
        # extra output row (D=4 pads to 8 sublanes anyway), then divide
        # the (D, L) output by it — a sublane-broadcast, not a lane tree.
        # _exp_unnorm optionally drops the max tree too (ECG_ATTN_MAXFREE).
        probs = _exp_unnorm(logits).astype(v.dtype)  # unnormalized
    if mode == "nopv":
        out = probs[:, :D, :]
        if s_ref is not None:
            s_ref[:] = jnp.ones_like(s_ref[:])
    else:
        ones = jnp.ones((G * H, 1, L), v.dtype)
        vx = jnp.concatenate([v, ones], axis=1)  # (G*H, D+1, M)
        # of[j, l] = sum_m vx[j, m] e[l, m]; row D is the softmax sum.
        of = _bmm(vx, probs, ((2,), (2,)),
                  precision=_pv_precision(v.dtype))  # (G*H, D+1, L) f32
        out = of[:, :D, :] / _guard_den(of[:, D:, :])
        if mode == "nosm":  # keep the ablation comparable: no normalizer
            out = of[:, :D, :]
        if s_ref is not None:
            s_ref[:] = jnp.broadcast_to(
                of[:, D:, :].reshape(G, H, 1, L), (G, H, _S_SUB, L)
            ).astype(s_ref.dtype)
    o_ref[:] = out.reshape(G, H, D, L).astype(o_ref.dtype)


def _flash_bwd_wanted() -> bool:
    """ECG_ATTN_FLASHBWD=0 falls back to the pre-round-3j backward (full
    in-kernel softmax recompute, dp*p reduction tree) — the A/B knob for
    measuring the flash backward's saving, and the escape hatch if a
    lowering regression ever hits the identity-transpose path."""
    import os

    return os.environ.get("ECG_ATTN_FLASHBWD", "1") != "0"


def _ds_classic(logits, g, v):
    """Pre-flash backward core: normalized probs + dp*p tree. Returns
    (ds f32, dv) with ds the softmax-jacobian product."""
    p = _softmax_f32(logits)
    pn = p.astype(v.dtype)
    dv = _bmm(g, pn, ((2,), (1,)))
    dp = _bmm(g, v, ((1,), (1,)))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    return ds, dv


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref, o_ref, s_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref):
    # Flash-style backward with the forward's folded softmax sum as a
    # residual (s_ref; see _fwd_kernel) and the flash delta identity:
    #   c[l] = sum_m p[l,m] dp[l,m] = sum_d g[d,l] o[d,l]
    # so the probabilities are never re-normalized: only the max tree is
    # recomputed, and the old sum tree, full-tile divide, and dp*p
    # reduction tree are all gone (r3c ablation: the softmax's 128-lane
    # tree reductions were the kernel's largest compute term).
    #
    # Round-3f refinement: the whole flash branch runs TRANSPOSED —
    # logits^T = k·q and dp^T = v·g (swapped dot operands, zero extra
    # cost), so ds^T[m, l] = e^T[m, l] (dp^T[m, l] − c[l]) / s[l] needs
    # c and 1/s indexed by l on LANES, exactly where the lane-major
    # residual and delta row already live. The previous formulation paid
    # one MXU identity pass plus an E-unrolled loop of (L, 1) slices to
    # move them onto sublanes; both are gone. The caller transposes the
    # static bias in and the accumulated dbias out (tiny XLA transposes,
    # once per call, not per grid step).
    b = pl.program_id(0)
    G, H, D, L = q_ref.shape
    E = G * H
    q = q_ref[:].reshape(E, D, L)
    k = k_ref[:].reshape(E, D, L)
    v = v_ref[:].reshape(E, D, L)
    g = g_ref[:].reshape(E, D, L)
    if not _flash_bwd_wanted():
        logits = _logits(q, k)
        if bias_ref is not None:
            bias = bias_ref[:].astype(jnp.float32)
            logits = (logits.reshape(G, H, L, L) + bias).reshape(E, L, L)
        ds, dv = _ds_classic(logits, g, v)
        dsn = ds.astype(q.dtype)
        # dq[d,l] = sum_m ds[l,m] k[d,m] ; dk[d,m] = sum_l ds[l,m] q[d,l]
        dq_ref[:] = _bmm(k, dsn, ((2,), (2,))).reshape(G, H, D, L).astype(
            dq_ref.dtype)
        dk_ref[:] = _bmm(q, dsn, ((2,), (1,))).reshape(G, H, D, L).astype(
            dk_ref.dtype)
        dv_ref[:] = dv.reshape(G, H, D, L).astype(dv_ref.dtype)
        if dbias_ref is not None:
            # Sequential-grid accumulation over the batch axis.
            @pl.when(b == 0)
            def _():
                dbias_ref[:] = jnp.zeros_like(dbias_ref[:])

            dbias_ref[:] += jnp.sum(ds.reshape(G, H, L, L), axis=0).astype(
                dbias_ref.dtype)
        return

    o = o_ref[:].reshape(E, D, L).astype(jnp.float32)
    # folded softmax sums: sublane 0 of the 8-row residual (_S_SUB)
    s = s_ref[:][:, :, :1, :].reshape(E, 1, L).astype(jnp.float32)
    logits_t = _logits(k, q)  # (E, M, L): lt[m, l] = sum_d k[d,m] q[d,l]
    if bias_ref is not None:
        bias_t = bias_ref[:].astype(jnp.float32)  # pre-transposed (H, M, L)
        logits_t = (logits_t.reshape(G, H, L, L) + bias_t).reshape(E, L, L)
    e_t = _exp_unnorm_t(logits_t)                 # f32 (E, M, L)

    rs = 1.0 / _guard_den(s)                      # (E, 1, L), lane-major l
    gf = g.astype(jnp.float32)
    gs = (gf * rs).astype(g.dtype)                # fold 1/s into g
    # dv[d,m] = sum_l p[l,m] g[d,l] = sum_l e^T[m,l] (g/s)[d,l]
    dv = _bmm(gs, e_t.astype(v.dtype), ((2,), (2,)))  # (E, D, M)
    dp_t = _bmm(v, g, ((1,), (1,)))               # (E, M, L) f32
    c = jnp.sum(gf * o, axis=1, keepdims=True)    # (E, 1, L) delta identity
    ds_t = e_t * (dp_t - c) * rs                  # lane broadcasts only
    dsn = ds_t.astype(q.dtype)
    # dq[d,l] = sum_m ds^T[m,l] k[d,m] ; dk[d,m] = sum_l ds^T[m,l] q[d,l]
    dq_ref[:] = _bmm(k, dsn, ((2,), (1,))).reshape(G, H, D, L).astype(
        dq_ref.dtype)
    dk_ref[:] = _bmm(q, dsn, ((2,), (2,))).reshape(G, H, D, L).astype(
        dk_ref.dtype)
    dv_ref[:] = dv.reshape(G, H, D, L).astype(dv_ref.dtype)
    if dbias_ref is not None:
        # Sequential-grid accumulation of ds^T; the caller transposes once.
        @pl.when(b == 0)
        def _():
            dbias_ref[:] = jnp.zeros_like(dbias_ref[:])

        dbias_ref[:] += jnp.sum(ds_t.reshape(G, H, L, L), axis=0).astype(
            dbias_ref.dtype)


def _elem_spec(G, H, D, L):
    return pl.BlockSpec((G, H, D, L), lambda b: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _bias_spec(H, L):
    return pl.BlockSpec((H, L, L), lambda b: (0, 0, 0),
                        memory_space=pltpu.VMEM)


# --- dense K-packed forward (round-3c) --------------------------------------
#
# The lane-packed (P*L, P*L) block-diagonal form computes P-fold redundant
# off-block logits: max/exp/cast touch 128x128 tiles of which only 1/P is
# useful. This forward computes logits DENSE as (L, P*L) — every lane a
# real (head, m) element — via an in-kernel block-diagonal K built by
# sublane-tiling + iota masking (no transposes, no gathers):
#
#   q arrives (B, H/P, L, P*D)   [lane index p*D + d]
#   BD_K[(p', d), (p, m)] = k[p, m, d] * (p == p')   (P*D, P*L)
#   logits = q @ BD_K -> (L, P*L), exact per-head values, no -1e9 filler.
#
# Softmax: the global row max (over all P segments) is subtracted — exact
# after normalization since each segment's sum shrinks by the same factor
# (underflow only if segments sit > ~87 logits apart; f32 e and a 1e-37
# sum clamp guard the degenerate case). Per-segment sums ride the pv
# matmul: v is augmented with a ones row BEFORE tiling, so the block mask
# itself becomes the per-segment summer:
#
#   BD_V[(p', j), (p, m)] = vx[p, m, j] * (p == p'),  vx = [v; 1]
#   of = BD_V @ e^T -> (P*(D+1), L); row (p, D) = sum_{m in p} e[l, (p,m)].


def _fwd_dense_kernel(P, L, D, q_ref, k_ref, v_ref, bias_ref, o_ref):
    G, Hg, _, PD = q_ref.shape
    E = G * Hg
    PL = P * L
    q = q_ref[:].reshape(E, L, PD)
    k = k_ref[:].reshape(E, D, PL)
    v = v_ref[:].reshape(E, D, PL)

    sub = jax.lax.broadcasted_iota(jnp.int32, (PD, PL), 0) // D
    lan = jax.lax.broadcasted_iota(jnp.int32, (PD, PL), 1) // L
    kt = jnp.concatenate([k] * P, axis=1)  # (E, P*D, P*L), row (p', d)
    bdk = jnp.where((sub == lan)[None], kt, 0).astype(k.dtype)
    logits = _bmm(q, bdk, ((2,), (1,)))  # (E, L, P*L) f32
    if bias_ref is not None:
        bias = bias_ref[:].astype(jnp.float32)  # (Hg, L, P*L) lane-packed
        logits = (logits.reshape(G, Hg, L, PL) + bias).reshape(E, L, PL)
    mx = jnp.max(logits, axis=-1, keepdims=True)  # global row max
    en = jnp.exp(logits - mx).astype(v.dtype)

    D1 = D + 1
    ones = jnp.ones((E, 1, PL), v.dtype)
    vx = jnp.concatenate([v, ones], axis=1)  # (E, D+1, P*L)
    subv = jax.lax.broadcasted_iota(jnp.int32, (P * D1, PL), 0) // D1
    lanv = jax.lax.broadcasted_iota(jnp.int32, (P * D1, PL), 1) // L
    vt = jnp.concatenate([vx] * P, axis=1)  # (E, P*(D+1), P*L)
    bdv = jnp.where((subv == lanv)[None], vt, 0).astype(v.dtype)
    of = _bmm(bdv, en, ((2,), (2,)),
              precision=_pv_precision(v.dtype))  # (E, P*(D+1), L) f32
    parts = []
    for p in range(P):
        num = of[:, p * D1:p * D1 + D, :]
        den = jnp.maximum(of[:, p * D1 + D:p * D1 + D1, :], 1e-37)
        parts.append(num / den)
    out = jnp.concatenate(parts, axis=1)  # (E, P*D, L), (p, d) sublane order
    o_ref[:] = out.reshape(G, Hg * P, D, L).astype(o_ref.dtype)


def _dense_group_size(B, Hg, L, P, D):
    """Divisor of B keeping the dense-forward working set in budget
    (padded f32 elements, same convention as _group_size)."""
    PL, PD = P * L, P * D
    lsub = -(-L // 8) * 8
    per_b = Hg * (2 * lsub * PL            # logits f32 + en
                  + 2 * 128 * PL           # bdk + bdv (PD, P(D+1) pad to 128)
                  + 2 * lsub * max(PD, 128)  # q block + out
                  + 2 * 8 * PL)            # k + v blocks
    budget = _max_padded()
    for g in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if B % g == 0 and g * per_b <= budget:
            return g
    return 1


def _dense_wanted() -> bool:
    """ECG_ATTN_DENSE=1 routes packable small-L stages through the dense
    K-packed forward (A/B knob, read at trace time)."""
    import os

    return os.environ.get("ECG_ATTN_DENSE", "0") == "1"


def _pack_q_dense(q, B, H, L, D, P):
    # (B, H, L, D) -> (B, H/P, L, P*D): lane index p*D + d.
    return (q.reshape(B, H // P, P, L, D)
            .transpose(0, 1, 3, 2, 4)
            .reshape(B, H // P, L, P * D))


def _pack_bias_lanes(bias, H, L, P):
    # (H, L, L) -> (H/P, L, P*L): lane index p*L + m.
    return (bias.reshape(H // P, P, L, L)
            .transpose(0, 2, 1, 3)
            .reshape(H // P, L, P * L))


def _fwd_dense(q, k, v, bias, P):
    B, H, L, D = q.shape
    Hg = H // P
    qp = _pack_q_dense(q, B, H, L, D, P)
    kp, vp = (_pack(a, B, H, L, D, P).transpose(0, 1, 3, 2) for a in (k, v))
    has_bias = bias is not None
    bp = _pack_bias_lanes(bias.reshape(H, L, L), H, L, P) if has_bias else None
    G = _dense_group_size(B, Hg, L, P, D)
    kernel = functools.partial(_fwd_dense_kernel, P, L, D)
    if not has_bias:
        kernel = functools.partial(
            lambda kf, qr, kr, vr, orf: kf(qr, kr, vr, None, orf), kernel)
    in_specs = [pl.BlockSpec((G, Hg, L, P * D), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, Hg, D, P * L), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, Hg, D, P * L), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    if has_bias:
        in_specs.append(pl.BlockSpec((Hg, L, P * L), lambda b: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
    args = (qp, kp, vp) + ((bp,) if has_bias else ())
    out = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=_elem_spec(G, H, D, L),
        out_shape=jax.ShapeDtypeStruct((B, H, D, L), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * (2 * L * L * D + L * L),
            bytes_accessed=q.size * 4 * 4,
            transcendentals=B * H * L * L,
        ),
        interpret=_interp(),
    )(*args)
    return out.transpose(0, 1, 3, 2)  # (B, H, L, D)


# Off-diagonal-block logit penalty for lane packing. exp(-1e9 - max) == 0
# in f32, so packed windows can never attend across block boundaries.
_NEG_INF = -1e9


def _pack_factor(B: int, H: int, L: int) -> int:
    """Lane-packing factor P: merge P heads into one (P*L, P*L) block-diag
    attention so small-L stages use full 128-lane MXU tiles.

    The round-3 profile (runs/profile_fwd_2048.log) showed the L<=64 stages
    dominating attention time INVERSELY to their FLOPs: an (L, L) logits
    tile at L=16 pads 16 -> 128 lanes, wasting 8x of every tile and 8x of
    the VMEM working set per useful element. Packing P = 128//L heads
    block-diagonally makes every matmul tile dense; the off-diagonal cross
    terms are computed (they ride in otherwise-padded lanes) and killed by
    a -1e9 additive mask before softmax.
    """
    import os

    if os.environ.get("ECG_ATTN_PACK", "1") == "0":  # A/B escape hatch
        return 1
    if L >= 128 or L & (L - 1):  # pack only power-of-two small L
        return 1
    P = min(128 // L, H)
    while P > 1 and H % P:
        P //= 2
    return P


def _block_diag_bias(bias, H: int, L: int, P: int):
    """(H, L, L) bias (or None) -> (H//P, P*L, P*L) block-diagonal bias
    with _NEG_INF off the diagonal blocks (the packing mask)."""
    if bias is None:
        b = jnp.zeros((H // P, P, L, L), jnp.float32)
    else:
        b = bias.reshape(H // P, P, L, L).astype(jnp.float32)
    vals = b[:, :, :, None, :]  # (H/P, P, L, 1, L)
    eye = jnp.eye(P, dtype=bool)[None, :, None, :, None]  # (1,P,1,P,1)
    out = jnp.where(eye, vals, _NEG_INF)  # (H/P, P, L, P, L)
    return out.reshape(H // P, P * L, P * L)


def _unpack_dbias(dbias, H: int, L: int, P: int):
    """Extract the diagonal blocks of a packed (H//P, P*L, P*L) bias grad
    back into (H, L, L)."""
    d = dbias.reshape(H // P, P, L, P, L)
    idx = jnp.arange(P)
    d = d[:, idx, :, idx, :]  # advanced indexing -> (P, H//P, L, L)
    return d.transpose(1, 0, 2, 3).reshape(H, L, L)


def _pack(a, B, H, L, D, P):
    # (B, H, L, D) -> (B, H//P, P*L, D): contiguous reshape, free in XLA.
    return a.reshape(B, H // P, P * L, D)


def _fwd(q, k, v, bias, want_s=False):
    B, H, L, D = q.shape
    P = _pack_factor(B, H, L)
    if P > 1 and _dense_wanted() and not _ablate_mode() and not want_s:
        return _fwd_dense(q, k, v,
                          bias.reshape(1, H, L, L) if bias is not None
                          else None, P)
    if P > 1:
        Hp, Lp = H // P, P * L
        qp, kp, vp = (_pack(a, B, H, L, D, P) for a in (q, k, v))
        bp = _block_diag_bias(
            bias.reshape(H, L, L) if bias is not None else None, H, L, P)
        out = _fwd_raw(qp, kp, vp, bp, Hp, Lp, want_s=want_s)
        if want_s:
            return out[0].reshape(B, H, L, D), out[1]
        return out.reshape(B, H, L, D)
    return _fwd_raw(q, k, v,
                    bias.reshape(H, L, L) if bias is not None else None,
                    H, L, want_s=want_s)


# The softmax-sum residual's sublane count. A (1, L) trailing block is
# legal by the "equal to the array's dims" rule and compiled on the
# round-2/3 libtpu, but the 2026-08-18 container's newer libtpu ABORTS
# lowering it (lower_to_llo.cc:1093 `Check failed: d >> 32 == 0 (-1 vs
# 0)` in LLOOpBuilder::cst — runs/r3l_mosaic_probe.log pinned it to the
# want_s forward alone). A single sublane pads to 8 in VMEM regardless,
# so an explicit 8-sublane residual (broadcast on write, row 0 on read)
# is physically free and sidesteps the crashing masked 1-sublane store.
_S_SUB = 8


def _s_spec(G, H, L):
    # Softmax-sum residual rides as (B, H, _S_SUB, L): last-two block dims
    # equal the array's, lane dim stays L (dense), and the kernel-side
    # (E, 1, L) view slices sublane 0 (see _S_SUB).
    return pl.BlockSpec((G, H, _S_SUB, L), lambda b: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _fwd_call(qt, kt, vt, bias, H, L, *, want_s=False):
    """The raw kernel launch on pre-transposed (B, H, D, L) operands;
    returns (B, H, D, L) (plus the (B, H, _S_SUB, L) f32 softmax sums when
    want_s). Factored out so glue cost (the XLA transposes in _fwd_raw)
    can be measured separately (profile_forward.py iso-raw)."""
    B, _, D, _ = qt.shape
    has_bias = bias is not None
    mode = _ablate_mode()

    def kernel(*refs):
        i = 3
        br = refs[i] if has_bias else None
        i += 1 if has_bias else 0
        o_ref = refs[i]
        s_ref = refs[i + 1] if want_s else None
        _fwd_kernel(refs[0], refs[1], refs[2], br, o_ref, s_ref, mode=mode)

    G = _group_size(B, H, L)
    in_specs = [_elem_spec(G, H, D, L)] * 3 + ([_bias_spec(H, L)] if has_bias else [])
    args = (qt, kt, vt) + ((bias,) if has_bias else ())
    out_specs = _elem_spec(G, H, D, L)
    out_shape = jax.ShapeDtypeStruct((B, H, D, L), qt.dtype)
    if want_s:
        out_specs = [out_specs, _s_spec(G, H, L)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((B, H, _S_SUB, L), jnp.float32)]
    return pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * (2 * L * L * D + L * L),
            bytes_accessed=qt.size * 4 * 4,
            transcendentals=B * H * L * L,
        ),
        interpret=_interp(),
    )(*args)


def _fwd_raw(q, k, v, bias, H, L, *, want_s=False):
    # (B, H, L, D) -> (B, H, D, L): lane dim becomes L (see _fwd_kernel note).
    qt, kt, vt = (a.transpose(0, 1, 3, 2) for a in (q, k, v))
    out = _fwd_call(qt, kt, vt, bias, H, L, want_s=want_s)
    if want_s:
        return out[0].transpose(0, 1, 3, 2), out[1]
    return out.transpose(0, 1, 3, 2)  # back to (B, H, L, D)


def _bwd(q, k, v, bias, g, o, s):
    """o: the forward output (B, H, L, D); s: the forward's folded softmax
    sums, already in the PACKED kernel layout (B, H/P, 1, P*L) f32."""
    B, H, L, D = q.shape
    P = _pack_factor(B, H, L)
    if P > 1:
        Hp, Lp = H // P, P * L
        qp, kp, vp, gp, op = (_pack(a, B, H, L, D, P)
                              for a in (q, k, v, g, o))
        bp = _block_diag_bias(
            bias.reshape(H, L, L) if bias is not None else None, H, L, P)
        # want_dbias: the packing mask is always passed as a kernel bias,
        # but a bias gradient is only owed when the caller supplied one.
        dq, dk, dv, dbias = _bwd_raw(qp, kp, vp, bp, gp, op, s, Hp, Lp,
                                     want_dbias=bias is not None)
        dq, dk, dv = (a.reshape(B, H, L, D) for a in (dq, dk, dv))
        if dbias is not None:
            dbias = _unpack_dbias(dbias, H, L, P).reshape(1, H, L, L).astype(
                bias.dtype)
        return dq, dk, dv, dbias
    return _bwd_raw(q, k, v,
                    bias.reshape(H, L, L) if bias is not None else None,
                    g, o, s, H, L, want_dbias=bias is not None,
                    dbias_dtype=bias.dtype if bias is not None else None)


def _bwd_call(qt, kt, vt, bias, gt, ot, s, H, L, *, want_dbias):
    """Raw backward launch on pre-transposed (B, H, D, L) operands (plus
    the forward output ot and softmax sums s); returns (dq, dk, dv) in
    (B, H, D, L) plus dbias (H, L, L) f32."""
    B, _, D, _ = qt.shape
    has_bias = bias is not None
    flash = _flash_bwd_wanted()
    if has_bias and flash:
        # The flash branch works on transposed logits (see _bwd_kernel):
        # the static bias goes in transposed, the accumulated ds^T sum
        # comes back out transposed.
        bias = bias.transpose(0, 2, 1)

    def kernel(*refs):
        i = 3
        br = refs[i] if has_bias else None
        i += 1 if has_bias else 0
        gr, orf, sr = refs[i], refs[i + 1], refs[i + 2]
        i += 3
        dbr = refs[i + 3] if (has_bias and want_dbias) else None
        _bwd_kernel(refs[0], refs[1], refs[2], br, gr, orf, sr,
                    refs[i], refs[i + 1], refs[i + 2], dbr)

    G = _group_size(B, H, L)
    in_specs = [_elem_spec(G, H, D, L)] * 3 \
        + ([_bias_spec(H, L)] if has_bias else []) \
        + [_elem_spec(G, H, D, L)] * 2 + [_s_spec(G, H, L)]
    args = (qt, kt, vt) + ((bias,) if has_bias else ()) + (gt, ot, s)
    out_specs = [_elem_spec(G, H, D, L)] * 3
    out_shape = [jax.ShapeDtypeStruct((B, H, D, L), qt.dtype)] * 3
    if has_bias and want_dbias:
        out_specs.append(_bias_spec(H, L))
        out_shape.append(jax.ShapeDtypeStruct((H, L, L), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * (5 * L * L * D + 3 * L * L),
            bytes_accessed=qt.size * 4 * 8,
            transcendentals=B * H * L * L,
        ),
        interpret=_interp(),
    )(*args)
    if has_bias and want_dbias:
        dq, dk, dv, dbias = outs
        if flash:
            dbias = dbias.transpose(0, 2, 1)
    else:
        dq, dk, dv = outs
        dbias = None
    return dq, dk, dv, dbias


def _bwd_raw(q, k, v, bias, g, o, s, H, L, *, want_dbias, dbias_dtype=None):
    qt, kt, vt, gt, ot = (a.transpose(0, 1, 3, 2) for a in (q, k, v, g, o))
    dq, dk, dv, dbias = _bwd_call(qt, kt, vt, bias, gt, ot, s, H, L,
                                  want_dbias=want_dbias)
    if dbias is not None and dbias_dtype is not None:
        dbias = dbias.reshape(1, H, L, L).astype(dbias_dtype)
    dq, dk, dv = (a.transpose(0, 1, 3, 2) for a in (dq, dk, dv))
    return dq, dk, dv, dbias


# --- per-window R-peak bias (the paper's namesake feature, fast path) -------
#
# The reference's windowed rel-pos bias factorizes (ops/attention.py
# RelativePositionEmbedding docs): bias_b[l, m] = toep[l, m] * in_b[l] *
# in_b[m], where toep[l, m] = table[l - m + W - 1] (batch-independent
# Toeplitz expansion of the learnable table, zero for |l - m| >= W) and
# in_b[l] = 1 iff off_b <= l < off_b + W (off_b = r_pos_b - W//2; edge
# truncation is automatic because l only ranges [0, L)). So per-window
# biases need only a per-window SCALAR offset in the kernel — the
# (B, H, L, L) bias tensor the round-2 XLA fallback materialized
# (VERDICT r2 weak item 1) never exists in any memory space.


def _window_mask(off_ref, W, G, L, PL):
    """(G, PL) in-window 0/1 mask from per-window f32 offsets.

    Lane position within each packed L-slot is iota % L (L is a power of
    two, so % is a cheap bitmask). Offsets arrive f32 (whole numbers) so
    the comparison runs on the VPU and the custom-VJP cotangent for
    offsets is a legal zero-float.
    """
    pos = (jax.lax.broadcasted_iota(jnp.int32, (G, PL), 1) % L).astype(
        jnp.float32)
    off = off_ref[:].reshape(G, 1).astype(jnp.float32)
    return ((pos >= off) & (pos < off + W)).astype(jnp.float32)


def _fwd_rpos_kernel(W, L, q_ref, k_ref, v_ref, toep_ref, off_ref, o_ref,
                     s_ref=None):
    G, Hp, D, PL = q_ref.shape
    q = q_ref[:].reshape(G * Hp, D, PL)
    k = k_ref[:].reshape(G * Hp, D, PL)
    v = v_ref[:].reshape(G * Hp, D, PL)
    logits = _logits(q, k)  # (G*Hp, PL, PL) f32
    m = _window_mask(off_ref, W, G, L, PL)  # (G, PL)
    toep = toep_ref[:].astype(jnp.float32)  # (Hp, PL, PL), zero off-blocks
    l4 = logits.reshape(G, Hp, PL, PL)
    l4 = l4 + toep[None] * (m[:, None, :, None] * m[:, None, None, :])
    if PL != L:
        blk = jax.lax.broadcasted_iota(jnp.int32, (PL, PL), 0) // L \
            == jax.lax.broadcasted_iota(jnp.int32, (PL, PL), 1) // L
        l4 = l4 + jnp.where(blk, 0.0, _NEG_INF)[None, None]
    # Sum/divide folded into pv via a ones row (see _fwd_kernel note);
    # _exp_unnorm optionally drops the max tree (ECG_ATTN_MAXFREE).
    lg = l4.reshape(G * Hp, PL, PL)
    en = _exp_unnorm(lg).astype(v.dtype)
    E, D = G * Hp, v.shape[1]
    ones = jnp.ones((E, 1, PL), v.dtype)
    vx = jnp.concatenate([v, ones], axis=1)
    of = _bmm(vx, en, ((2,), (2,)),
              precision=_pv_precision(v.dtype))  # (E, D+1, PL) f32
    out = of[:, :D, :] / _guard_den(of[:, D:, :])
    if s_ref is not None:
        s_ref[:] = jnp.broadcast_to(
            of[:, D:, :].reshape(G, Hp, 1, PL), (G, Hp, _S_SUB, PL)
        ).astype(s_ref.dtype)
    o_ref[:] = out.reshape(G, Hp, D, PL).astype(o_ref.dtype)


def _bwd_rpos_kernel(W, L, q_ref, k_ref, v_ref, toep_ref, off_ref, g_ref,
                     o_ref, s_ref, dq_ref, dk_ref, dv_ref, dtoep_ref):
    # Flash-style backward: saved folded softmax sums + the delta
    # identity, TRANSPOSED like _bwd_kernel (which documents the scheme).
    # The window outer-product mask and the packing block mask are
    # symmetric, so they apply unchanged to the transposed logits; the
    # Toeplitz table is not — the caller passes it pre-transposed (and
    # transposes the accumulated dtoep^T back, once per call).
    b = pl.program_id(0)
    G, Hp, D, PL = q_ref.shape
    E = G * Hp
    q = q_ref[:].reshape(E, D, PL)
    k = k_ref[:].reshape(E, D, PL)
    v = v_ref[:].reshape(E, D, PL)
    g = g_ref[:].reshape(E, D, PL)
    m = _window_mask(off_ref, W, G, L, PL)  # (G, PL)
    mm = m[:, None, :, None] * m[:, None, None, :]  # (G, 1, PL, PL), symm.
    toep = toep_ref[:].astype(jnp.float32)
    if PL != L:
        blk = jax.lax.broadcasted_iota(jnp.int32, (PL, PL), 0) // L \
            == jax.lax.broadcasted_iota(jnp.int32, (PL, PL), 1) // L
        blk_pen = jnp.where(blk, 0.0, _NEG_INF)[None, None]  # symmetric
    else:
        blk_pen = None
    flash = _flash_bwd_wanted()
    if not flash:
        l4 = _logits(q, k).reshape(G, Hp, PL, PL) + toep[None] * mm
    else:
        # lt[m, l]: toep arrives pre-transposed, masks are symmetric.
        l4 = _logits(k, q).reshape(G, Hp, PL, PL) + toep[None] * mm
    if blk_pen is not None:
        l4 = l4 + blk_pen
    lg = l4.reshape(E, PL, PL)
    if not flash:
        ds, dv = _ds_classic(lg, g, v)
        dsn = ds.astype(q.dtype)
        dq_ref[:] = _bmm(k, dsn, ((2,), (2,))).reshape(G, Hp, D, PL).astype(
            dq_ref.dtype)
        dk_ref[:] = _bmm(q, dsn, ((2,), (1,))).reshape(G, Hp, D, PL).astype(
            dk_ref.dtype)
    else:
        o = o_ref[:].reshape(E, D, PL).astype(jnp.float32)
        s = s_ref[:][:, :, :1, :].reshape(E, 1, PL).astype(jnp.float32)
        e_t = _exp_unnorm_t(lg)                    # f32 (E, M, L)
        rs = 1.0 / _guard_den(s)                   # (E, 1, L) lane-major
        gf = g.astype(jnp.float32)
        gs = (gf * rs).astype(g.dtype)
        dv = _bmm(gs, e_t.astype(v.dtype), ((2,), (2,)))
        dp_t = _bmm(v, g, ((1,), (1,)))            # (E, M, L) f32
        c = jnp.sum(gf * o, axis=1, keepdims=True)  # (E, 1, L)
        ds = e_t * (dp_t - c) * rs                 # ds^T, lane broadcasts
        dsn = ds.astype(q.dtype)
        dq_ref[:] = _bmm(k, dsn, ((2,), (1,))).reshape(G, Hp, D, PL).astype(
            dq_ref.dtype)
        dk_ref[:] = _bmm(q, dsn, ((2,), (2,))).reshape(G, Hp, D, PL).astype(
            dk_ref.dtype)
    dv_ref[:] = dv.reshape(G, Hp, D, PL).astype(dv_ref.dtype)

    @pl.when(b == 0)
    def _():
        dtoep_ref[:] = jnp.zeros_like(dtoep_ref[:])

    # d toep = sum_b ds * mask-outer (the mask gates the bias's reach);
    # on the flash path this accumulates dtoep^T (mm is symmetric).
    dtoep_ref[:] += jnp.sum(ds.reshape(G, Hp, PL, PL) * mm, axis=0).astype(
        dtoep_ref.dtype
    )


def _off_spec(G):
    # Offsets ride as (B, 1, 1) so the block's LAST TWO dims equal the
    # array dims — Mosaic requires last-two block dims divisible by (8,
    # 128) or equal to the array's (the (G, 1) form was rejected on
    # hardware; runs/tpu_kernel_tests_r3.log).
    return pl.BlockSpec((G, 1, 1), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _rpos_single(q, k, v, toep, W: int, offsets=None):
    """Single-device fused_attention_rpos (see the public dispatcher)."""
    return _rpos_fwd_impl(q, k, v, toep, W, offsets)


def fused_attention_rpos(q, k, v, toep, W: int, offsets=None):
    """Per-window R-peak biased attention, fully fused.

    (`offsets` carries a None default only so the static `W` can sit
    before it for the nondiff_argnums slot; it is required.)

    q/k/v: (B, H, L, D) with q pre-scaled. toep: (1, H, L, L) Toeplitz
    expansion of the rel-pos table (RelativePositionEmbedding.toeplitz).
    offsets: (B,) float32 window starts (r_pos - W//2, whole numbers).
    W: static window width. Gradients flow to q/k/v/toep (the table's
    scatter-transpose runs in XLA outside); offsets get zero cotangents.

    Under an ambient mesh with a 'data' axis this dispatches to an
    explicit shard_map twin (batch-sharded q/k/v/offsets, replicated
    toep, psum'd dtoep) — see _data_mesh for why jit-SPMD alone cannot
    shard a Mosaic custom call.
    """
    if _data_mesh(q.shape[0]) is not None:
        return _rpos_dp(q, k, v, toep, W, offsets)
    return _rpos_single(q, k, v, toep, W, offsets)


def _rpos_call(qt, kt, vt, toep_bd, off, W, L, Hp, Lp, *, want_s=False):
    """Raw rpos launch on pre-transposed (B, Hp, D, Lp) packed operands."""
    B, _, D, _ = qt.shape
    G = _group_size(B, Hp, Lp)
    if G > 1:
        G //= 2  # masked-bias temp doubles the working set
    kernel = functools.partial(_fwd_rpos_kernel, W, L)
    out_specs = _elem_spec(G, Hp, D, Lp)
    out_shape = jax.ShapeDtypeStruct((B, Hp, D, Lp), qt.dtype)
    if want_s:
        out_specs = [out_specs, _s_spec(G, Hp, Lp)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((B, Hp, _S_SUB, Lp), jnp.float32)]
    return pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[_elem_spec(G, Hp, D, Lp)] * 3
        + [_bias_spec(Hp, Lp), _off_spec(G)],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Hp * (2 * Lp * Lp * D + Lp * Lp),
            bytes_accessed=qt.size * 4 * 4,
            transcendentals=B * Hp * Lp * Lp,
        ),
        interpret=_interp(),
    )(qt, kt, vt, toep_bd, off)


def _rpos_fwd_impl(q, k, v, toep, W, offsets, want_s=False):
    B, H, L, D = q.shape
    P = _pack_factor(B, H, L)
    Hp, Lp = H // P, P * L
    qp, kp, vp = (_pack(a, B, H, L, D, P) for a in (q, k, v))
    toep_bd = _pack_toep(toep, H, L, P)
    off = offsets.reshape(B, 1, 1).astype(jnp.float32)
    qt, kt, vt = (a.transpose(0, 1, 3, 2) for a in (qp, kp, vp))
    out = _rpos_call(qt, kt, vt, toep_bd, off, W, L, Hp, Lp, want_s=want_s)
    if want_s:
        return out[0].transpose(0, 1, 3, 2).reshape(B, H, L, D), out[1]
    return out.transpose(0, 1, 3, 2).reshape(B, H, L, D)


def _pack_toep(toep, H, L, P):
    """(1, H, L, L) Toeplitz -> packed (H//P, P*L, P*L) with ZERO (not
    -1e9) off-diagonal blocks: the packing -inf mask is added separately
    in-kernel so the mask-gated bias multiply stays a clean product."""
    t = toep.reshape(H // P, P, L, L).astype(jnp.float32)
    vals = t[:, :, :, None, :]
    eye = jnp.eye(P, dtype=bool)[None, :, None, :, None]
    out = jnp.where(eye, vals, 0.0)
    return out.reshape(H // P, P * L, P * L)


def _rpos_fwd(q, k, v, toep, W, offsets):
    out, s = _rpos_fwd_impl(q, k, v, toep, W, offsets, want_s=True)
    return out, (q, k, v, toep, offsets, out, s)


def _rpos_bwd_call(qt, kt, vt, toep_bd, off, gt, ot, s, W, L, Hp, Lp):
    """Raw rpos backward launch; returns grads in packed layouts plus the
    packed (Hp, Lp, Lp) f32 dtoep."""
    B, _, D, _ = qt.shape
    flash = _flash_bwd_wanted()
    if flash:
        # Transposed-flash contract (see _bwd_rpos_kernel): Toeplitz goes
        # in transposed; the accumulated dtoep^T comes back out.
        toep_bd = toep_bd.transpose(0, 2, 1)
    G = _group_size(B, Hp, Lp)
    if G > 1:
        G //= 2
    kernel = functools.partial(_bwd_rpos_kernel, W, L)
    dq, dk, dv, dtoep = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[_elem_spec(G, Hp, D, Lp)] * 3
        + [_bias_spec(Hp, Lp), _off_spec(G)]
        + [_elem_spec(G, Hp, D, Lp)] * 2 + [_s_spec(G, Hp, Lp)],
        out_specs=[_elem_spec(G, Hp, D, Lp)] * 3 + [_bias_spec(Hp, Lp)],
        out_shape=[jax.ShapeDtypeStruct((B, Hp, D, Lp), qt.dtype)] * 3
        + [jax.ShapeDtypeStruct((Hp, Lp, Lp), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Hp * (5 * Lp * Lp * D + 3 * Lp * Lp),
            bytes_accessed=qt.size * 4 * 8,
            transcendentals=B * Hp * Lp * Lp,
        ),
        interpret=_interp(),
    )(qt, kt, vt, toep_bd, off, gt, ot, s)
    if flash:
        dtoep = dtoep.transpose(0, 2, 1)
    return dq, dk, dv, dtoep


def _rpos_bwd(W, res, g):
    q, k, v, toep, offsets, o, s = res
    B, H, L, D = q.shape
    P = _pack_factor(B, H, L)
    Hp, Lp = H // P, P * L
    qp, kp, vp, gp, op = (_pack(a, B, H, L, D, P) for a in (q, k, v, g, o))
    toep_bd = _pack_toep(toep, H, L, P)
    off = offsets.reshape(B, 1, 1).astype(jnp.float32)
    qt, kt, vt, gt, ot = (a.transpose(0, 1, 3, 2)
                          for a in (qp, kp, vp, gp, op))
    dq, dk, dv, dtoep = _rpos_bwd_call(qt, kt, vt, toep_bd, off, gt, ot, s,
                                       W, L, Hp, Lp)
    dq, dk, dv = (a.transpose(0, 1, 3, 2).reshape(B, H, L, D)
                  for a in (dq, dk, dv))
    dtoep = _unpack_dbias(dtoep, H, L, P).reshape(1, H, L, L).astype(toep.dtype)
    return dq, dk, dv, dtoep, jnp.zeros_like(offsets)


_rpos_single.defvjp(_rpos_fwd, _rpos_bwd)


# --- shard_map twins (multi-chip; see _data_mesh docstring) ------------------
#
# Outer custom_vjp whose forward AND backward are each one explicit
# jax.shard_map over the ambient mesh's 'data' axis: operands and
# residuals batch-sharded, the bias/toep replicated in and its cotangent
# explicitly psum'd over 'data' before leaving the shard_map (with
# check_vma=False nothing reduces replicated-input grads for us). The
# single-device kernels run unchanged per shard — local batch B/n_data
# picks its own lane-pack factor, which is numerically exact either way.
# Numerics pinned by tests/test_mesh_pallas.py (DP + DPxTP equality) and
# __graft_entry__.dryrun_multichip's kernel leg.

def _dp_specs():
    from jax.sharding import PartitionSpec as P

    return P("data"), P()


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _rpos_dp(q, k, v, toep, W: int, offsets=None):
    dp, rep = _dp_specs()
    f = jax.shard_map(
        lambda q, k, v, t, o: _rpos_fwd_impl(q, k, v, t, W, o),
        mesh=_data_mesh(), in_specs=(dp, dp, dp, rep, dp),
        out_specs=dp, check_vma=False,
    )
    return f(q, k, v, toep, offsets)


def _rpos_dp_fwd(q, k, v, toep, W, offsets):
    dp, rep = _dp_specs()
    f = jax.shard_map(
        lambda q, k, v, t, o: _rpos_fwd_impl(q, k, v, t, W, o, want_s=True),
        mesh=_data_mesh(), in_specs=(dp, dp, dp, rep, dp),
        out_specs=(dp, dp), check_vma=False,
    )
    out, s = f(q, k, v, toep, offsets)
    return out, (q, k, v, toep, offsets, out, s)


def _rpos_dp_bwd(W, res, g):
    q, k, v, toep, offsets, o, s = res
    dp, rep = _dp_specs()

    def body(q, k, v, toep, offsets, o, s, g):
        dq, dk, dv, dtoep, doff = _rpos_bwd(W, (q, k, v, toep, offsets, o, s), g)
        return dq, dk, dv, jax.lax.psum(dtoep, "data"), doff

    f = jax.shard_map(
        body, mesh=_data_mesh(),
        in_specs=(dp, dp, dp, rep, dp, dp, dp, dp),
        out_specs=(dp, dp, dp, rep, dp), check_vma=False,
    )
    return f(q, k, v, toep, offsets, o, s, g)


_rpos_dp.defvjp(_rpos_dp_fwd, _rpos_dp_bwd)


@jax.custom_vjp
def _fused_dp(q, k, v, bias):
    dp, rep = _dp_specs()
    f = jax.shard_map(
        lambda q, k, v, b: _fwd(q, k, v, b), mesh=_data_mesh(),
        in_specs=(dp, dp, dp, rep), out_specs=dp, check_vma=False,
    )
    return f(q, k, v, bias)


def _fused_dp_fwd(q, k, v, bias):
    dp, rep = _dp_specs()
    f = jax.shard_map(
        lambda q, k, v, b: _fwd(q, k, v, b, want_s=True), mesh=_data_mesh(),
        in_specs=(dp, dp, dp, rep), out_specs=(dp, dp), check_vma=False,
    )
    out, s = f(q, k, v, bias)
    return out, (q, k, v, bias, out, s)


def _fused_dp_bwd(res, g):
    q, k, v, bias, o, s = res
    dp, rep = _dp_specs()

    def body(q, k, v, bias, g, o, s):
        dq, dk, dv, dbias = _bwd(q, k, v, bias, g, o, s)
        return dq, dk, dv, jax.lax.psum(dbias, "data")

    f = jax.shard_map(
        body, mesh=_data_mesh(),
        in_specs=(dp, dp, dp, rep, dp, dp, dp),
        out_specs=(dp, dp, dp, rep), check_vma=False,
    )
    return f(q, k, v, bias, g, o, s)


_fused_dp.defvjp(_fused_dp_fwd, _fused_dp_bwd)


@jax.custom_vjp
def _fused_dp_nobias(q, k, v):
    dp, _ = _dp_specs()
    f = jax.shard_map(
        lambda q, k, v: _fwd(q, k, v, None), mesh=_data_mesh(),
        in_specs=(dp, dp, dp), out_specs=dp, check_vma=False,
    )
    return f(q, k, v)


def _fused_dp_nb_fwd(q, k, v):
    dp, _ = _dp_specs()
    f = jax.shard_map(
        lambda q, k, v: _fwd(q, k, v, None, want_s=True), mesh=_data_mesh(),
        in_specs=(dp, dp, dp), out_specs=(dp, dp), check_vma=False,
    )
    out, s = f(q, k, v)
    return out, (q, k, v, out, s)


def _fused_dp_nb_bwd(res, g):
    q, k, v, o, s = res
    dp, _ = _dp_specs()

    def body(q, k, v, g, o, s):
        dq, dk, dv, _ = _bwd(q, k, v, None, g, o, s)
        return dq, dk, dv

    f = jax.shard_map(
        body, mesh=_data_mesh(), in_specs=(dp,) * 6,
        out_specs=(dp, dp, dp), check_vma=False,
    )
    return f(q, k, v, g, o, s)


_fused_dp_nobias.defvjp(_fused_dp_nb_fwd, _fused_dp_nb_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _rpos_packed(qp, kp, vp, toep_bd, off, W: int, L: int, Hp: int, Lp: int):
    """rpos attention on pre-packed (B, Hp, D, Lp) operands (blc path)."""
    return _rpos_call(qp, kp, vp, toep_bd, off, W, L, Hp, Lp)


def _rp_fwd(qp, kp, vp, toep_bd, off, W, L, Hp, Lp):
    out, s = _rpos_call(qp, kp, vp, toep_bd, off, W, L, Hp, Lp, want_s=True)
    return out, (qp, kp, vp, toep_bd, off, out, s)


def _rp_bwd(W, L, Hp, Lp, res, g):
    qp, kp, vp, toep_bd, off, o, s = res
    dq, dk, dv, dtoep = _rpos_bwd_call(qp, kp, vp, toep_bd, off, g, o, s,
                                       W, L, Hp, Lp)
    return dq, dk, dv, dtoep.astype(toep_bd.dtype), jnp.zeros_like(off)


_rpos_packed.defvjp(_rp_fwd, _rp_bwd)


def fused_attention_rpos_blc(q2, k2, v2, toep, W: int, offsets,
                             num_heads: int):
    """Per-window R-peak attention on (B, L, H*D) stream-layout operands
    (see fused_attention_blc for the layout contract)."""
    B, L, inner = q2.shape
    H = num_heads
    D = inner // H
    P = _pack_factor(B, H, L)
    Hp, Lp = H // P, P * L

    def pack(a2):
        a5 = a2.reshape(B, L, Hp, P, D).transpose(0, 2, 4, 3, 1)
        return a5.reshape(B, Hp, D, Lp)

    toep_bd = _pack_toep(toep, H, L, P)
    off = offsets.reshape(B, 1, 1).astype(jnp.float32)
    out = _rpos_packed(pack(q2), pack(k2), pack(v2), toep_bd, off,
                       W, L, Hp, Lp)
    return (out.reshape(B, Hp, D, P, L)
            .transpose(0, 4, 1, 3, 2)
            .reshape(B, L, inner))


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _fused_single(q, k, v, bias: Optional[jnp.ndarray] = None):
    """Single-device fused_attention (see the public dispatcher)."""
    return _fwd(q, k, v, bias)


def fused_attention(q, k, v, bias: Optional[jnp.ndarray] = None):
    """softmax(q @ k^T + bias) @ v, fully fused in VMEM per (b, h).

    q is pre-scaled by the caller (same contract as
    ops.attention.multi_head_attention). bias: (1, H, L, L) or None.

    Under an ambient mesh with a 'data' axis this dispatches to an
    explicit shard_map twin (batch-sharded operands, replicated bias,
    psum'd dbias) — see _data_mesh.
    """
    if _data_mesh(q.shape[0]) is not None:
        if bias is None:
            return _fused_dp_nobias(q, k, v)
        return _fused_dp(q, k, v, bias)
    return _fused_single(q, k, v, bias)


def _fused_fwd(q, k, v, bias):
    out, s = _fwd(q, k, v, bias, want_s=True)
    return out, (q, k, v, bias, out, s)


def _fused_bwd(res, g):
    q, k, v, bias, o, s = res
    return _bwd(q, k, v, bias, g, o, s)


_fused_single.defvjp(_fused_fwd, _fused_bwd)


# --- glue-free stream interface (round-3c) ----------------------------------
#
# The dma-mode ablation showed a compute-free kernel still costs ~40% of
# the attention share: per-call XLA glue (the (B, H, L, D) transposes in
# LinearProjection -> _pack -> _fwd_raw -> epilogue, 4 relayouts) plus the
# launch floor. This interface goes straight from the projections'
# (B, L, H*D) stream layout to the kernel's packed (B, H/P, D, P*L)
# operand layout in ONE fused 5D transpose each way.


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_attention_packed(qp, kp, vp, bias_bd, Hp: int, Lp: int):
    """Attention on pre-packed (B, H/P, D, P*L) operands with a packed
    block-diagonal (H/P, P*L, P*L) bias (which doubles as the -inf packing
    mask). Returns (B, H/P, D, P*L)."""
    return _fwd_call(qp, kp, vp, bias_bd, Hp, Lp)


def _fap_fwd(qp, kp, vp, bias_bd, Hp, Lp):
    out, s = _fwd_call(qp, kp, vp, bias_bd, Hp, Lp, want_s=True)
    return out, (qp, kp, vp, bias_bd, out, s)


def _fap_bwd(Hp, Lp, res, g):
    qp, kp, vp, bias_bd, o, s = res
    dq, dk, dv, dbias = _bwd_call(qp, kp, vp, bias_bd, g, o, s, Hp, Lp,
                                  want_dbias=True)
    return dq, dk, dv, dbias.astype(bias_bd.dtype)


_fused_attention_packed.defvjp(_fap_fwd, _fap_bwd)


def fused_attention_blc(q2, k2, v2, bias, num_heads: int):
    """softmax(q @ k^T + bias) @ v on (B, L, H*D) stream-layout operands.

    q2 is pre-scaled. bias: None or (1, H, L, L). Head h of token m lives
    at channels [h*D, (h+1)*D) — exactly the projections' output layout
    (reference transformer.py:298-320 semantics), so no (B, H, L, D)
    intermediate ever exists. Differentiable (packing/unpacking is plain
    jax; the kernel pair is the custom-VJP above)."""
    B, L, inner = q2.shape
    H = num_heads
    D = inner // H
    P = _pack_factor(B, H, L)
    Hp, Lp = H // P, P * L

    def pack(a2):
        a5 = a2.reshape(B, L, Hp, P, D).transpose(0, 2, 4, 3, 1)
        return a5.reshape(B, Hp, D, Lp)

    bias_bd = _block_diag_bias(
        bias.reshape(H, L, L) if bias is not None else None, H, L, P)
    out = _fused_attention_packed(pack(q2), pack(k2), pack(v2),
                                  bias_bd, Hp, Lp)
    return (out.reshape(B, Hp, D, P, L)
            .transpose(0, 4, 1, 3, 2)
            .reshape(B, L, inner))


def blc_wanted() -> bool:
    """ECG_ATTN_GLUE=blc routes MSAttention through the stream-layout
    interface (A/B experiment knob, read at trace time). Disabled under an
    ambient mesh: the blc wrappers have no shard_map twins (they are a
    measured single-chip A/B instrument, not a production path — RESULTS.md
    'measured negatives'), so mesh runs take the sharded default kernels."""
    import os

    if _data_mesh() is not None:
        return False
    return os.environ.get("ECG_ATTN_GLUE", "") == "blc"
