"""Maxfree escape-hatch guard (utils/logit_audit.py, VERDICT r4 item 5).

ECG_ATTN_MAXFREE=1 is exactness-conditional on max pre-softmax logit < 60;
the guard audits a probe batch at load/first-request time and refuses
above the margin cap (55). An unsafe checkpoint is manufactured by
inflating one R-wave rel-pos bias TABLE entry — the bias is additive on
the logits, so the violation is input-independent."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecg_denoise_tpu.models import build_model
from ecg_denoise_tpu.utils.logit_audit import (
    AUDIT_CAP,
    make_logit_max_fn,
    maxfree_active,
    run_maxfree_guard,
)


@pytest.fixture(scope="module")
def ralenet_and_vars():
    model = build_model("ralenet")
    x = jnp.zeros((2, 2, 256), jnp.float32)
    variables = jax.jit(lambda k, s: model.init(k, s, train=False))(
        jax.random.PRNGKey(0), x
    )
    return model, variables


def _probe():
    return jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 2, 256)), jnp.float32)


def _inflate_bias_table(variables, value=1000.0):
    """Unsafe checkpoint: one huge rel-pos table entry -> logits > cap."""
    import flax

    v = flax.core.unfreeze(variables) if hasattr(variables, "unfreeze") else dict(variables)
    params = jax.tree.map(lambda a: a, v["params"])  # copy
    tab = params["rwattn1"]["relative_position_bias_table"]
    params["rwattn1"]["relative_position_bias_table"] = (
        jnp.full_like(tab, value))
    return {**v, "params": params}


def test_logit_max_fn_safe_on_fresh_init(ralenet_and_vars):
    model, variables = ralenet_and_vars
    gmax = float(make_logit_max_fn(model, variables)(_probe()))
    assert np.isfinite(gmax) and gmax < AUDIT_CAP


def test_logit_max_fn_detects_inflated_bias(ralenet_and_vars):
    model, variables = ralenet_and_vars
    bad = _inflate_bias_table(variables)
    gmax = float(make_logit_max_fn(model, bad)(_probe()))
    assert gmax >= 1000.0 - 100.0  # table value dominates the logits


def test_guard_refuses_unsafe_checkpoint(ralenet_and_vars, monkeypatch):
    model, variables = ralenet_and_vars
    bad = _inflate_bias_table(variables)
    monkeypatch.setenv("ECG_ATTN_MAXFREE", "1")
    monkeypatch.delenv("ECG_ATTN_MAXFREE_FORCE", raising=False)
    assert maxfree_active()
    with pytest.raises(RuntimeError, match="NOT exact"):
        run_maxfree_guard(model, bad, _probe(), context="test")


def test_guard_force_downgrades_to_warning(ralenet_and_vars, monkeypatch):
    model, variables = ralenet_and_vars
    bad = _inflate_bias_table(variables)
    monkeypatch.setenv("ECG_ATTN_MAXFREE", "1")
    monkeypatch.setenv("ECG_ATTN_MAXFREE_FORCE", "1")
    gmax = run_maxfree_guard(model, bad, _probe(), context="test")
    assert gmax >= AUDIT_CAP  # measured, reported, not raised


def test_guard_passes_safe_checkpoint(ralenet_and_vars, monkeypatch):
    model, variables = ralenet_and_vars
    monkeypatch.setenv("ECG_ATTN_MAXFREE", "1")
    gmax = run_maxfree_guard(model, variables, _probe(), context="test")
    assert gmax < AUDIT_CAP


def test_serving_first_request_audits(ralenet_and_vars, monkeypatch):
    """Denoiser refuses the first request on an unsafe checkpoint when the
    maxfree knob is on (the serving leg of the guard)."""
    from ecg_denoise_tpu.serving import Denoiser

    model, variables = ralenet_and_vars
    bad = _inflate_bias_table(variables)
    monkeypatch.setenv("ECG_ATTN_MAXFREE", "1")
    monkeypatch.delenv("ECG_ATTN_MAXFREE_FORCE", raising=False)
    d = Denoiser(model, bad, max_batch=8)
    x = np.asarray(_probe())
    with pytest.raises(RuntimeError, match="NOT exact"):
        d(x)
    # With the knob off the same Denoiser serves (fresh instance: the
    # audit flag is per-process-instance).
    monkeypatch.setenv("ECG_ATTN_MAXFREE", "0")
    d2 = Denoiser(model, bad, max_batch=8)
    assert d2(x).shape == x.shape
