"""Numerical parity vs the PyTorch reference: identical weights, identical
outputs (<= 1e-4) — the oracle behind BASELINE.md's 'SNR parity within 1e-3'.

Loads the reference model from /root/reference (read-only import; torchvision
is stubbed — it is imported there but unused), copies its randomly-initialised
state_dict into our flax parameter tree via an explicit layout mapping
(torch Conv1d (out,in,k) -> flax HIO (k,in,out); ConvTranspose1d (in,out,k)
-> (k,in,out); Linear (out,in) -> (in,out)), and compares eval-mode forward
passes on the same input.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# The reference imports torchvision (unused); stub it before importing.
_tv = types.ModuleType("torchvision")
_tv.ops = types.ModuleType("torchvision.ops")
sys.modules.setdefault("torchvision", _tv)
sys.modules.setdefault("torchvision.ops", _tv.ops)
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp


def _conv_w(t):  # torch Conv1d (out, in, k) -> HIO (k, in, out)
    return jnp.asarray(t.detach().numpy().transpose(2, 1, 0))


def _tconv_w(t):  # torch ConvTranspose1d (in, out, k) -> (k, in, out)
    return jnp.asarray(t.detach().numpy().transpose(2, 0, 1))


def _vec(t):
    return jnp.asarray(t.detach().numpy())


def _bn(params, stats, prefix, tmod):
    params[prefix] = {"scale": _vec(tmod.weight), "bias": _vec(tmod.bias)}
    stats[prefix] = {"mean": _vec(tmod.running_mean), "var": _vec(tmod.running_var)}


@pytest.fixture(scope="module")
def torch_unet():
    from model.UNet import UNet as TorchUNet

    torch.manual_seed(0)
    m = TorchUNet()
    m(torch.zeros(2, 2, 256))  # materialise Lazy BN modules
    m.eval()
    return m


def test_unet_forward_parity(torch_unet):
    from ecg_denoise_tpu.models import UNet

    params, stats = {}, {}
    for i in range(4):
        enc = torch_unet.EncList[i]
        params[f"enc{i}"] = {
            "conv": {"kernel": _conv_w(enc.conv.weight), "bias": _vec(enc.conv.bias)}
        }
        _bn(params[f"enc{i}"], stats.setdefault(f"enc{i}", {}), "bn", enc.bn)
        dec = torch_unet.DecList[i]
        params[f"dec{i}"] = {
            "conv": {"kernel": _tconv_w(dec.conv.weight), "bias": _vec(dec.conv.bias)}
        }
        _bn(params[f"dec{i}"], stats.setdefault(f"dec{i}", {}), "bn", dec.bn)
    bn_map = {0: "bottleneck_conv0", 3: "bottleneck_conv1", 6: "bottleneck_conv2"}
    for idx, name in bn_map.items():
        c = torch_unet.bottleneck[idx]
        params[name] = {"kernel": _conv_w(c.weight), "bias": _vec(c.bias)}
    for idx, name in {2: "bottleneck_bn0", 5: "bottleneck_bn1"}.items():
        _bn(params, stats, name, torch_unet.bottleneck[idx])

    # Fix nesting: BN stats for enc/dec live under the block subtree.
    batch_stats = {}
    for k, v in stats.items():
        batch_stats[k] = v
    variables = {"params": params, "batch_stats": batch_stats}

    x = np.random.default_rng(0).standard_normal((4, 2, 256)).astype(np.float32)
    with torch.no_grad():
        ref = torch_unet(torch.from_numpy(x)).numpy()
    ours = np.asarray(UNet().apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)
