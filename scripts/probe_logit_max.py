#!/usr/bin/env python
"""Measure the max pre-softmax attention logit of a trained checkpoint.

Adjudicates ECG_ATTN_MAXFREE as an inference default (VERDICT r3 item 2):
the maxfree kernel computes exp(min(logit, 60)) with no per-row max
subtraction, so it is overflow-safe and weight-exact whenever the trained
model's logits stay below _MAXFREE_CAP=60 (kernels/attention_pallas.py).
This probe runs the full test split through the XLA attention path
EAGERLY on CPU with multi_head_attention wrapped to record
max(q@k^T + bias) per call, and prints the global max + per-stage maxima.

    python scripts/probe_logit_max.py --model_index 4 --noise_type_index 3 \
        --intensity_index 0 [--ckpt path.msgpack] [--limit 512]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from ecg_denoise_tpu.config import build_argparser, config_from_args
from ecg_denoise_tpu.data.dataset import load_split_arrays
from ecg_denoise_tpu.models import build_model
from ecg_denoise_tpu.train import create_train_state, load_checkpoint, find_model
from ecg_denoise_tpu.ops import attention as attn_mod

_RECORDED = []  # (L, max_logit) per multi_head_attention call
_orig_mha = attn_mod.multi_head_attention


def _recording_mha(q, k, v, bias, *, use_pallas=False):
    # Mirror the XLA branch of multi_head_attention exactly; eager on CPU so
    # float() is concrete. q arrives pre-scaled by the caller (MSAttention).
    if isinstance(bias, attn_mod.RPosBias):
        bias = bias.materialize()
    logits = jnp.einsum("bhld,bhmd->bhlm", q, k,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    if bias is not None:
        logits = logits + bias
    _RECORDED.append((q.shape[2], float(jnp.max(logits))))
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhlm,bhmd->bhld", probs, v,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST).astype(v.dtype)


def main():
    parser = build_argparser(__doc__)
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--limit", type=int, default=0,
                        help="probe only the first N test windows (0 = all)")
    parser.add_argument("--probe_batch", type=int, default=128)
    args = parser.parse_args()
    cfg = config_from_args(args)

    _, _, te_n, te_c = load_split_arrays(
        cfg.noise_name, cfg.noise_intensity, path=cfg.data_path,
        n_select=cfg.n_select, seed=cfg.seed, split_file=cfg.split_file,
    )
    if args.limit:
        te_n = te_n[: args.limit]
    model = build_model(cfg.model_index, use_pallas=False, dtype=jnp.float32)
    state, _ = create_train_state(
        model, jax.random.PRNGKey(cfg.seed), jnp.asarray(te_n[:2]),
        learning_rate=cfg.lr,
    )
    path = args.ckpt or find_model(
        os.path.join(cfg.model_save_dir, cfg.model_name), cfg.model_name)
    if path is None:
        sys.exit(f"no checkpoint found for {cfg.model_name}")
    state = load_checkpoint(path, state)

    attn_mod.multi_head_attention = _recording_mha
    try:
        bs = args.probe_batch
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        for i in range(0, len(te_n), bs):
            xb = jnp.asarray(te_n[i : i + bs], jnp.float32)
            model.apply(variables, xb, train=False)
            print(f"  batch {i // bs}: running max "
                  f"{max(m for _, m in _RECORDED):.4f}", flush=True)
    finally:
        attn_mod.multi_head_attention = _orig_mha

    per_stage = {}
    for L, m in _RECORDED:
        per_stage[L] = max(per_stage.get(L, -np.inf), m)
    gmax = max(per_stage.values())
    print(f"LOGIT_MAX ckpt={path} windows={len(te_n)} global_max={gmax:.4f} "
          f"cap=60.0 margin={60.0 - gmax:.4f}")
    for L in sorted(per_stage):
        print(f"  stage L={L:4d}: max_logit={per_stage[L]:.4f}")
    print("MAXFREE_SAFE" if gmax < 55.0 else "MAXFREE_UNSAFE")


if __name__ == "__main__":
    main()
