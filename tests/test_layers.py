"""Direct torch-semantics tests for ops/layers.py against torch.nn itself.

tests/test_torch_parity.py certifies whole-model parity but skips when the
reference repo is not mounted; these tests need only torch (a baked-in
dependency), so the layer-level torch-compat contracts documented in
ops/layers.py:9-18 (cross-correlation conv, transpose-conv arithmetic,
BatchNorm momentum/unbiased-running-var, eps conventions, upsample grid)
stay covered in any deployment.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from ecg_denoise_tpu.ops.layers import (
    BatchNorm1d,
    Conv1d,
    ConvTranspose1d,
    Dense,
    LayerNorm,
    PartialConv1d,
    adaptive_avg_pool1d,
    linear_upsample2x,
    max_pool1d,
)


def _t(x):
    return torch.from_numpy(np.asarray(x))


def test_dense_matches_torch_linear(rng):
    x = rng.standard_normal((5, 7, 11)).astype(np.float32)
    tm = torch.nn.Linear(11, 13)
    with torch.no_grad():
        ref = tm(_t(x)).numpy()
    variables = {"params": {
        "kernel": jnp.asarray(tm.weight.detach().numpy().T),
        "bias": jnp.asarray(tm.bias.detach().numpy()),
    }}
    ours = np.asarray(Dense(13).apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-6, rtol=1e-6)


def test_dense_lane_pack_matches_unpacked(rng):
    # rows = 4*16 = 64 divisible by P = 128//16 = 8; results differ only by
    # summation-order rounding (ops/layers.py _dense_pack_factor docstring).
    x = rng.standard_normal((4, 16, 16)).astype(np.float32)
    k = rng.standard_normal((16, 16)).astype(np.float32)
    b = rng.standard_normal((16,)).astype(np.float32)
    variables = {"params": {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}}
    plain = np.asarray(Dense(16).apply(variables, jnp.asarray(x)))
    packed = np.asarray(
        Dense(16, lane_pack=True).apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(packed, plain, atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize(
    "stride,padding,dilation,groups",
    [(1, 0, 1, 1), (2, 3, 1, 1), (1, 2, 2, 1), (1, 1, 1, 2)],
)
def test_conv1d_matches_torch(rng, stride, padding, dilation, groups):
    x = rng.standard_normal((3, 4, 32)).astype(np.float32)
    tm = torch.nn.Conv1d(4, 6, 5, stride=stride, padding=padding,
                         dilation=dilation, groups=groups)
    with torch.no_grad():
        ref = tm(_t(x)).numpy()
    variables = {"params": {
        # torch (out, in/groups, k) -> ours HIO (k, in/groups, out)
        "kernel": jnp.asarray(tm.weight.detach().numpy().transpose(2, 1, 0)),
        "bias": jnp.asarray(tm.bias.detach().numpy()),
    }}
    ours = np.asarray(
        Conv1d(6, 5, stride=stride, padding=padding, dilation=dilation,
               groups=groups).apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize(
    "stride,padding,output_padding",
    [(1, 0, 0), (2, 1, 0), (2, 2, 1), (4, 1, 3)],
)
def test_conv_transpose1d_matches_torch(rng, stride, padding, output_padding):
    x = rng.standard_normal((2, 3, 16)).astype(np.float32)
    tm = torch.nn.ConvTranspose1d(3, 5, 4, stride=stride, padding=padding,
                                  output_padding=output_padding)
    with torch.no_grad():
        ref = tm(_t(x)).numpy()
    variables = {"params": {
        # torch (in, out, k) -> ours (k, in, out)
        "kernel": jnp.asarray(tm.weight.detach().numpy().transpose(2, 0, 1)),
        "bias": jnp.asarray(tm.bias.detach().numpy()),
    }}
    ours = np.asarray(
        ConvTranspose1d(5, 4, stride=stride, padding=padding,
                        output_padding=output_padding)
        .apply(variables, jnp.asarray(x)))
    assert ours.shape == ref.shape  # (L-1)*s - 2p + k + output_padding
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_batchnorm1d_train_output_and_running_stats(rng):
    x = rng.standard_normal((8, 4, 32)).astype(np.float32)
    tm = torch.nn.BatchNorm1d(4)  # momentum 0.1, eps 1e-5
    with torch.no_grad():
        tm.weight.copy_(_t(rng.standard_normal(4).astype(np.float32)))
        tm.bias.copy_(_t(rng.standard_normal(4).astype(np.float32)))
        tm.running_mean.copy_(_t(rng.standard_normal(4).astype(np.float32)))
        tm.running_var.copy_(_t(rng.random(4).astype(np.float32) + 0.5))
    variables = {
        "params": {"scale": jnp.asarray(tm.weight.detach().numpy()),
                   "bias": jnp.asarray(tm.bias.detach().numpy())},
        # .numpy() views torch's storage and jax CPU zero-copies numpy
        # arrays, so snapshot with .copy() or torch's in-place running-stat
        # update during the train forward would mutate our "old" stats too.
        "batch_stats": {"mean": jnp.asarray(tm.running_mean.numpy().copy()),
                        "var": jnp.asarray(tm.running_var.numpy().copy())},
    }
    tm.train()
    ref = tm(_t(x)).detach().numpy()
    ours, updated = BatchNorm1d().apply(
        variables, jnp.asarray(x), use_running_average=False,
        mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-5)
    # torch updates running stats with the UNBIASED batch variance.
    np.testing.assert_allclose(np.asarray(updated["batch_stats"]["mean"]),
                               tm.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(updated["batch_stats"]["var"]),
                               tm.running_var.numpy(), atol=1e-6)
    # Eval mode uses the (original) running stats.
    tm2 = torch.nn.BatchNorm1d(4)
    with torch.no_grad():
        tm2.weight.copy_(tm.weight)
        tm2.bias.copy_(tm.bias)
    tm2.running_mean.copy_(torch.as_tensor(
        np.asarray(variables["batch_stats"]["mean"])))
    tm2.running_var.copy_(torch.as_tensor(
        np.asarray(variables["batch_stats"]["var"])))
    tm2.eval()
    ref_eval = tm2(_t(x)).detach().numpy()
    ours_eval = np.asarray(BatchNorm1d().apply(
        variables, jnp.asarray(x), use_running_average=True))
    np.testing.assert_allclose(ours_eval, ref_eval, atol=1e-5, rtol=1e-5)


def test_layernorm_matches_torch_eps(rng):
    x = rng.standard_normal((4, 10, 24)).astype(np.float32)
    tm = torch.nn.LayerNorm(24)  # eps 1e-5 (flax default would be 1e-6)
    with torch.no_grad():
        tm.weight.copy_(_t(rng.standard_normal(24).astype(np.float32)))
        tm.bias.copy_(_t(rng.standard_normal(24).astype(np.float32)))
        ref = tm(_t(x)).numpy()
    variables = {"params": {
        "scale": jnp.asarray(tm.weight.detach().numpy()),
        "bias": jnp.asarray(tm.bias.detach().numpy()),
    }}
    ours = np.asarray(LayerNorm().apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_pooling_and_upsample_match_torch(rng):
    x = rng.standard_normal((3, 5, 32)).astype(np.float32)
    ref_max = torch.nn.MaxPool1d(2)(_t(x)).numpy()
    np.testing.assert_allclose(
        np.asarray(max_pool1d(jnp.asarray(x))), ref_max, atol=0)
    ref_gap = torch.nn.AdaptiveAvgPool1d(1)(_t(x)).numpy()
    np.testing.assert_allclose(
        np.asarray(adaptive_avg_pool1d(jnp.asarray(x))), ref_gap, atol=1e-6)
    ref_up = torch.nn.Upsample(scale_factor=2, mode="linear",
                               align_corners=False)(_t(x)).numpy()
    np.testing.assert_allclose(
        np.asarray(linear_upsample2x(jnp.asarray(x))), ref_up,
        atol=1e-6, rtol=1e-6)


def test_partial_conv_passes_untouched_channels(rng):
    # Reference quirk (model/transformer.py:16-59): only dim//n_div leading
    # channels are convolved; with n_div == dim exactly ONE channel is.
    x = rng.standard_normal((2, 8, 16)).astype(np.float32)
    m = PartialConv1d(dim=8, n_div=8)
    import jax

    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(m.apply(variables, jnp.asarray(x)))
    assert y.shape == x.shape
    np.testing.assert_array_equal(y[:, 1:, :], x[:, 1:, :])
    assert not np.allclose(y[:, :1, :], x[:, :1, :])
