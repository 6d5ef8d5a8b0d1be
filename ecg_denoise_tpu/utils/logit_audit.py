"""Maxfree-exactness audit: max pre-softmax attention logit of a model.

The ECG_ATTN_MAXFREE=1 kernel variant replaces the softmax's per-row max
subtraction with an elementwise cap min(logit, 60): bit-exact whenever no
logit exceeds _MAXFREE_CAP (kernels/attention_pallas.py), silently LOSSY
above it — the trained flagship ralenet hits 191.5 at its L=16 stage
(results/round4/logit_max_full.log), which is why maxfree is default-off.

This module is the round-4 probe (scripts/probe_logit_max.py) moved into
the package so serving/bench/train can GUARD the escape hatch at
checkpoint-load time (VERDICT r4 item 5): one jitted forward over a probe
batch records max(q@k^T + bias) across every attention call; above the
audit threshold the guard refuses (ECG_ATTN_MAXFREE_FORCE=1 downgrades to
a warning for users who accept saturated attention weights).

The audit is exact FOR THE PROBE BATCH: logits depend on the inputs, so a
random probe is a lower bound — callers pass real data where they have it
(fit() audits the first train batch; bench audits its own workload;
serving audits the first real request batch per process).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

AUDIT_CAP = 55.0  # refuse margin below the kernel's exactness cap of 60


def maxfree_active() -> bool:
    return os.environ.get("ECG_ATTN_MAXFREE", "0") == "1"


def make_logit_max_fn(model, variables, **apply_kwargs):
    """Jitted x -> max pre-softmax logit over every attention call.

    Monkeypatches ops.attention.multi_head_attention for the duration of
    the TRACE (model.apply runs synchronously under jit), recording each
    call's traced max(q@k^T + bias); the patch is removed before returning.
    Runs the XLA einsum formulation — the same logits the kernels see (the
    kernels' qk matmul accumulates f32 identically).
    """
    from ecg_denoise_tpu.ops import attention as attn_mod

    @jax.jit
    def logit_max(x):
        rec = []
        orig = attn_mod.multi_head_attention

        def recording(q, k, v, bias, *, use_pallas=False):
            if isinstance(bias, attn_mod.RPosBias):
                bias = bias.materialize()
            logits = jnp.einsum("bhld,bhmd->bhlm",
                                q.astype(jnp.float32), k.astype(jnp.float32),
                                precision=jax.lax.Precision.HIGHEST)
            if bias is not None:
                logits = logits + bias.astype(jnp.float32)
            rec.append(jnp.max(logits))
            return orig(q, k, v, bias, use_pallas=False)

        attn_mod.multi_head_attention = recording
        try:
            model.apply(variables, x, train=False, **apply_kwargs)
        finally:
            attn_mod.multi_head_attention = orig
        if not rec:  # model without attention (UNet/DANet/ACDAE families)
            return jnp.float32(-jnp.inf)
        return jnp.max(jnp.stack(rec))

    return logit_max


def run_maxfree_guard(model, variables, probe, *, context: str,
                      cap: float = AUDIT_CAP, **apply_kwargs) -> float:
    """Audit `probe` and refuse-or-warn when maxfree would be lossy.

    Returns the measured max logit (also printed as an audit line).
    Raises RuntimeError above `cap` unless ECG_ATTN_MAXFREE_FORCE=1.
    Call only when maxfree_active().
    """
    gmax = float(make_logit_max_fn(model, variables, **apply_kwargs)(probe))
    verdict = "SAFE" if gmax < cap else "UNSAFE"
    print(f"MAXFREE_AUDIT[{context}]: max_logit={gmax:.4f} cap={cap} "
          f"(exactness bound 60.0) -> {verdict}", flush=True)
    if gmax >= cap:
        msg = (f"ECG_ATTN_MAXFREE=1 is NOT exact for this checkpoint: max "
               f"pre-softmax logit {gmax:.2f} >= {cap} (kernel cap 60 — "
               f"attention weights would saturate). Unset ECG_ATTN_MAXFREE "
               f"or set ECG_ATTN_MAXFREE_FORCE=1 to accept lossy attention.")
        if os.environ.get("ECG_ATTN_MAXFREE_FORCE", "0") == "1":
            print(f"MAXFREE_AUDIT[{context}]: FORCED past the guard: {msg}",
                  flush=True)
        else:
            raise RuntimeError(msg)
    return gmax
