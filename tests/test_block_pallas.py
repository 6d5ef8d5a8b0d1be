"""Fused-block kernel parity: apply_fast == RaleNet.apply(train=False)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ecg_denoise_tpu.kernels.block_pallas as bp
import ecg_denoise_tpu.kernels.attention_pallas as ap
from ecg_denoise_tpu.models import RaleNet
from ecg_denoise_tpu.models.ralenet_fast import apply_fast


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(bp, "_INTERPRET", True)
    monkeypatch.setattr(ap, "_INTERPRET", True)


@pytest.mark.parametrize("variant", ["full", "mlp", "nra"])
def test_apply_fast_matches_reference_path(variant):
    model = RaleNet(variant=variant)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 256), jnp.float32)
    variables = jax.jit(lambda k, s: model.init(k, s, train=False))(
        jax.random.PRNGKey(0), x
    )
    # Randomise the (zero-init) bias tables so the bias path is exercised.
    if variant in ("mlp", "full"):
        params = dict(variables["params"])
        for n in range(1, 5):
            t = params[f"rwattn{n}"]["relative_position_bias_table"]
            params[f"rwattn{n}"] = {
                "relative_position_bias_table": 0.02
                * jax.random.normal(jax.random.PRNGKey(n), t.shape)
            }
        variables = {**variables, "params": params}

    ref = model.apply(variables, x, train=False)
    fast = apply_fast(variables, x, variant=variant)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_apply_fast_r_pos():
    model = RaleNet(variant="full")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 256), jnp.float32)
    variables = jax.jit(lambda k, s: model.init(k, s, train=False))(
        jax.random.PRNGKey(0), x
    )
    ref = model.apply(variables, x, train=False, r_pos=jnp.int32(100))
    fast = apply_fast(variables, x, variant="full", r_pos=jnp.int32(100))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)
