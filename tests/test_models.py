"""Model construction/shape/jit tests for every architecture in the registry."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecg_denoise_tpu.models import build_model, MODEL_NAMES, ResNetCls, NewRale
from ecg_denoise_tpu.models.ralenet_12leads import frozen_param_mask

# Reference parameter counts, verified against the torch models
# (model/transformer.py ralenet(high_level_enhence=True): 1,087,282;
#  model/UNet.py UNet: 10,374).
REF_PARAM_COUNTS = {"unet": 10_374, "ralenet": 1_087_282}


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


@pytest.mark.parametrize("idx,name", list(enumerate(MODEL_NAMES)))
def test_denoiser_shapes(idx, name, key):
    model = build_model(idx)
    x = jnp.asarray(np.random.default_rng(idx).standard_normal((2, 2, 256)), jnp.float32)
    variables = model.init(key, x, train=True)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 2, 256)
    assert np.isfinite(np.asarray(y)).all()
    if name in REF_PARAM_COUNTS:
        n = sum(p.size for p in jax.tree.leaves(variables["params"]))
        assert n == REF_PARAM_COUNTS[name]


def test_ralenet_variants_differ(key):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 2, 256)), jnp.float32)
    outs = {}
    for name in ("ralenet_nra", "ralenet_mlp", "ralenet"):
        m = build_model(name)
        v = m.init(key, x, train=True)
        outs[name] = np.asarray(m.apply(v, x, train=False))
    # nra has no rwattn params; mlp/full do.
    m_nra = build_model("ralenet_nra")
    v_nra = m_nra.init(key, x, train=True)
    assert not any("rwattn" in "/".join(map(str, p)) for p in _param_paths(v_nra["params"]))
    m_full = build_model("ralenet")
    v_full = m_full.init(key, x, train=True)
    assert any("rwattn" in "/".join(map(str, p)) for p in _param_paths(v_full["params"]))


def _param_paths(params):
    return [
        tuple(getattr(k, "key", str(k)) for k in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    ]


def test_ralenet_jit_forward(key):
    model = build_model("ralenet")
    x = jnp.ones((2, 2, 256))
    variables = model.init(key, x, train=True)

    @jax.jit
    def fwd(v, x):
        return model.apply(v, x, train=False)

    y = fwd(variables, x)
    assert y.shape == (2, 2, 256)


def test_ralenet_r_pos_hook(key):
    """r_pos recentres the bias window; different r_pos -> different output
    once the bias table is nonzero."""
    model = build_model("ralenet")
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 2, 256)), jnp.float32)
    variables = model.init(key, x, train=True)
    # Bias tables are zero-init (reference quirk), so bump them to nonzero.
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: v + 0.05 if any("rwattn" in str(getattr(k, "key", "")) for k in p) else v,
        variables["params"],
    )
    variables = {**variables, "params": params}
    y_a = model.apply(variables, x, train=False, r_pos=jnp.asarray(64))
    y_b = model.apply(variables, x, train=False, r_pos=jnp.asarray(192))
    y_def = model.apply(variables, x, train=False)
    assert not np.allclose(np.asarray(y_a), np.asarray(y_b))
    assert np.isfinite(np.asarray(y_def)).all()


def test_ralenet_per_window_r_pos_matches_scalar(key):
    """A (B,) r_pos vector applies each window's own R-peak bias — row i of
    the batched forward equals the scalar-r_pos forward of window i."""
    model = build_model("ralenet")
    x = jnp.asarray(np.random.default_rng(5).standard_normal((3, 2, 256)), jnp.float32)
    variables = model.init(key, x, train=True)
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: v + 0.05 if any("rwattn" in str(getattr(k, "key", "")) for k in p) else v,
        variables["params"],
    )
    variables = {**variables, "params": params}
    rp = jnp.asarray([40, 128, 220], jnp.int32)
    batched = np.asarray(model.apply(variables, x, train=False, r_pos=rp))
    for i in range(3):
        single = np.asarray(
            model.apply(variables, x[i : i + 1], train=False, r_pos=rp[i])
        )
        np.testing.assert_allclose(batched[i : i + 1], single, atol=1e-5)


def test_detected_r_pos_train_step_runs(key):
    """make_epoch_fns(detect_r_pos=True) — the --r_pos detect training path —
    compiles and runs a RaleNet epoch with per-window detected peaks."""
    from ecg_denoise_tpu.train.state import create_train_state
    from ecg_denoise_tpu.train.steps import make_epoch_fns

    model = build_model("ralenet")
    noisy = jnp.asarray(
        np.random.default_rng(6).standard_normal((8, 2, 256)), jnp.float32
    )
    clean = noisy * 0.5
    state, tx = create_train_state(model, key, noisy[:2])
    train_epoch, eval_epoch = make_epoch_fns(model, tx, donate=False,
                                             detect_r_pos=True)
    state, m = train_epoch(state, noisy, clean, jax.random.PRNGKey(1), 4)
    ev = eval_epoch(state, noisy, clean, 4)
    assert np.isfinite(float(m["loss"])) and np.isfinite(float(ev["snr"]))


def test_resnet_cls_shapes(key):
    model = ResNetCls()
    x = jnp.ones((2, 2, 1000))
    variables = model.init(key, x, train=True)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 2)


def test_newrale_freeze_mask(key):
    model = NewRale()
    x = jnp.ones((2, 12, 256))
    variables = model.init(key, x, train=True)
    mask = frozen_param_mask(variables["params"])
    leaves = jax.tree.leaves(mask)
    assert any(leaves) and not all(leaves)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 12, 256)


def test_batchnorm_updates_stats(key):
    model = build_model("unet")
    x = jnp.asarray(np.random.default_rng(3).standard_normal((8, 2, 256)) * 3 + 1, jnp.float32)
    variables = model.init(key, x, train=True)
    _, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mut["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_ralenet_remat_grad():
    """use_remat=True (jax.checkpoint on blocks) computes identical grads."""
    import jax, jax.numpy as jnp
    from ecg_denoise_tpu.models import RaleNet

    x = jnp.ones((2, 2, 256), jnp.float32) * 0.1

    def loss(model):
        v = jax.jit(lambda k, s: model.init(k, s, train=False))(
            jax.random.PRNGKey(0), x
        )
        g = jax.grad(
            lambda p: jnp.sum(model.apply({**v, "params": p}, x, train=False) ** 2)
        )(v["params"])
        return jax.tree.leaves(g)[0]

    g_plain = loss(RaleNet(variant="nra", use_remat=False))
    g_remat = loss(RaleNet(variant="nra", use_remat=True))
    import numpy as np

    np.testing.assert_allclose(np.asarray(g_plain), np.asarray(g_remat), atol=1e-5)


def test_ralenet_bfloat16_forward():
    import jax, jax.numpy as jnp
    from ecg_denoise_tpu.models import RaleNet

    model = RaleNet(variant="full", dtype=jnp.bfloat16)
    x = jnp.ones((2, 2, 256), jnp.float32)
    v = jax.jit(lambda k, s: model.init(k, s, train=False))(jax.random.PRNGKey(0), x)
    out = model.apply(v, x, train=False)
    assert out.dtype == jnp.bfloat16 and out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))


def test_normalizers():
    import numpy as np
    from ecg_denoise_tpu.data.normalize import znorm, minmax_norm

    x = np.random.default_rng(0).standard_normal((4, 2, 256)) * 3 + 1
    z = znorm(x)
    np.testing.assert_allclose(z.mean(-1), 0, atol=1e-12)
    np.testing.assert_allclose(z.std(-1), 1, atol=1e-12)
    m = minmax_norm(x)
    assert m.min() >= 0 and m.max() <= 1
    # Constant rows pass through without NaN.
    c = np.ones((1, 2, 16))
    assert np.isfinite(znorm(c)).all() and np.isfinite(minmax_norm(c)).all()
