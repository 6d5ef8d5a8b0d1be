"""torch -> flax weight transfer for every reference model family.

Maps a *live* reference PyTorch module's weights onto our flax variable
trees (layout conversions: torch Conv1d (out,in,k) -> flax HIO (k,in,out);
ConvTranspose1d (in,out,k) -> (k,in,out); Linear (out,in) -> (in,out)).

Two uses:
* migration — users of the reference can import their trained `.pth`
  checkpoints into this framework (`variables_from_state_dict` +
  `build_reference_model`);
* parity oracles — tests/test_torch_parity.py and cli/parity_train.py
  transfer weights and compare outputs / training trajectories against the
  running reference (reference model layout: model/transformer.py,
  model/UNet.py, model/DAM.py, model/ACDAE.py, model/ralenet_12leads.py).

Requires torch; the reference repo (read-only) is imported at runtime as the
source of module classes — no reference code is vendored here.
"""

from __future__ import annotations

import os
import sys
import types

import jax.numpy as jnp

REFERENCE_ROOT = "/root/reference"


def load_reference_path(root: str = REFERENCE_ROOT) -> None:
    """Make the reference repo importable (stubs its unused torchvision)."""
    tv = types.ModuleType("torchvision")
    tv.ops = types.ModuleType("torchvision.ops")
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.ops", tv.ops)
    if root not in sys.path:
        sys.path.insert(0, root)


def build_reference_model(model_index: int):
    """Instantiate the reference torch model for --model_index
    (reference main.py:63-80 dispatch; Lazy modules are materialised)."""
    import torch

    load_reference_path()
    if model_index == 0:
        from model.UNet import UNet

        m = UNet()
        m(torch.zeros(2, 2, 256))  # materialise Lazy BN modules
    elif model_index == 1:
        from model.DAM import Seq2Seq2

        m = Seq2Seq2()
        m(torch.zeros(2, 2, 256))  # materialise Lazy convs
    elif model_index == 2:
        from model.raletransformer import ralenet

        m = ralenet()
    elif model_index == 3:
        from model.transformer import ralenet

        m = ralenet(low_level_enhence=False)
    elif model_index == 4:
        from model.transformer import ralenet

        m = ralenet(high_level_enhence=True)
    elif model_index == 5:
        from model.ACDAE import ACDAE

        m = ACDAE()
    else:
        raise ValueError(f"model_index {model_index} not in 0..5")
    return m


# --- layout primitives ------------------------------------------------------


def conv_w(t):  # torch Conv1d (out, in, k) -> HIO (k, in, out)
    return jnp.asarray(t.detach().numpy().transpose(2, 1, 0))


def tconv_w(t):  # torch ConvTranspose1d (in, out, k) -> (k, in, out)
    return jnp.asarray(t.detach().numpy().transpose(2, 0, 1))


def vec(t):
    return jnp.asarray(t.detach().numpy())


def dense(tmod):  # torch Linear (out, in) -> flax (in, out)
    p = {"kernel": jnp.asarray(tmod.weight.detach().numpy().T)}
    if tmod.bias is not None:
        p["bias"] = vec(tmod.bias)
    return p


def ln(tmod):
    return {"scale": vec(tmod.weight), "bias": vec(tmod.bias)}


def bn_into(params: dict, stats: dict, prefix: str, tmod) -> None:
    params[prefix] = {"scale": vec(tmod.weight), "bias": vec(tmod.bias)}
    stats[prefix] = {"mean": vec(tmod.running_mean), "var": vec(tmod.running_var)}


# --- UNet (reference model/UNet.py:96-141) ----------------------------------


def unet_variables(tm) -> dict:
    params, stats = {}, {}
    for i in range(4):
        enc = tm.EncList[i]
        params[f"enc{i}"] = {
            "conv": {"kernel": conv_w(enc.conv.weight), "bias": vec(enc.conv.bias)}
        }
        bn_into(params[f"enc{i}"], stats.setdefault(f"enc{i}", {}), "bn", enc.bn)
        dec = tm.DecList[i]
        params[f"dec{i}"] = {
            "conv": {"kernel": tconv_w(dec.conv.weight), "bias": vec(dec.conv.bias)}
        }
        bn_into(params[f"dec{i}"], stats.setdefault(f"dec{i}", {}), "bn", dec.bn)
    for idx, name in {0: "bottleneck_conv0", 3: "bottleneck_conv1", 6: "bottleneck_conv2"}.items():
        c = tm.bottleneck[idx]
        params[name] = {"kernel": conv_w(c.weight), "bias": vec(c.bias)}
    for idx, name in {2: "bottleneck_bn0", 5: "bottleneck_bn1"}.items():
        bn_into(params, stats, name, tm.bottleneck[idx])
    return {"params": params, "batch_stats": stats}


# --- DANet / Seq2Seq2 (reference model/DAM.py:341-350) -----------------------


def _aprelu(tmod):
    fcn = tmod.fcn
    return {
        "fc1": dense(fcn[0]), "fc2": dense(fcn[3]),
        "bn1": {"scale": vec(fcn[1].weight), "bias": vec(fcn[1].bias)},
        "bn2": {"scale": vec(fcn[4].weight), "bias": vec(fcn[4].bias)},
    }


def _aprelu_stats(tmod):
    fcn = tmod.fcn
    return {
        "bn1": {"mean": vec(fcn[1].running_mean), "var": vec(fcn[1].running_var)},
        "bn2": {"mean": vec(fcn[4].running_mean), "var": vec(fcn[4].running_var)},
    }


def _dam(tmod):
    # Reference fcn1/fcn2 are the SAME Sequential (shared weights); map once.
    fcn = tmod.fcn1
    params = {
        "fcn_fc1": dense(fcn[0]), "fcn_fc2": dense(fcn[3]),
        "fcn_bn1": {"scale": vec(fcn[1].weight), "bias": vec(fcn[1].bias)},
        "fcn_bn2": {"scale": vec(fcn[4].weight), "bias": vec(fcn[4].bias)},
        "convsa": {"kernel": conv_w(tmod.convsa.weight), "bias": vec(tmod.convsa.bias)},
    }
    stats = {
        "fcn_bn1": {"mean": vec(fcn[1].running_mean), "var": vec(fcn[1].running_var)},
        "fcn_bn2": {"mean": vec(fcn[4].running_mean), "var": vec(fcn[4].running_var)},
    }
    return params, stats


def seq2seq2_variables(tm) -> dict:
    params, stats = {}, {}
    for i, cell in enumerate(tm.enc.EncoderList):
        params[f"enc{i}"] = {
            "conv": {"kernel": conv_w(cell.conv.weight), "bias": vec(cell.conv.bias)},
            "aprelu": _aprelu(cell.activate),
        }
        bn_into(params[f"enc{i}"], stats.setdefault(f"enc{i}", {}), "bn", cell.bn)
        stats[f"enc{i}"]["aprelu"] = _aprelu_stats(cell.activate)
    for i, cell in enumerate(tm.dec.DecoderList):
        params[f"dec{i}"] = {
            "deconv": {"kernel": tconv_w(cell.deconv.weight), "bias": vec(cell.deconv.bias)},
            "aprelu": _aprelu(cell.activate),
        }
        bn_into(params[f"dec{i}"], stats.setdefault(f"dec{i}", {}), "bn", cell.bn)
        stats[f"dec{i}"]["aprelu"] = _aprelu_stats(cell.activate)
        if not cell.last:
            dp, ds = _dam(cell.dam)
            params[f"dec{i}"]["dam"] = dp
            stats[f"dec{i}"]["dam"] = ds
    return {"params": params, "batch_stats": stats}


# --- ACDAE (reference model/ACDAE.py:62-86) ----------------------------------


def acdae_variables(tm) -> dict:
    params = {}
    for i, blk in enumerate(tm.EncList):
        params[f"enc{i}_conv"] = {
            "kernel": conv_w(blk.conv.weight), "bias": vec(blk.conv.bias)
        }
    for i, blk in enumerate(tm.DecList):
        params[f"dec{i}_conv"] = {
            "kernel": tconv_w(blk.conv.weight), "bias": vec(blk.conv.bias)
        }
        params[f"dec{i}_eca"] = {"conv": {"kernel": conv_w(blk.ECA.conv.weight)}}
    return {"params": params, "batch_stats": {}}


# --- RaleNet family (reference model/transformer.py:560-679) -----------------


def _block_params(tblock, local_enhence):
    p = {
        "norm1": ln(tblock.norm1),
        "norm2": ln(tblock.norm2),
        "attn": {
            "qkv_proj": {
                "to_q": dense(tblock.attn.qkv_proj.to_q),
                "to_kv": dense(tblock.attn.qkv_proj.to_kv),
            },
            "proj": dense(tblock.attn.proj),
        },
        "mlp": {"fc1": dense(tblock.mlp.fc1), "fc2": dense(tblock.mlp.fc2)},
    }
    if local_enhence:
        p["mlp"]["leconv"] = {
            "partial_conv3": {"kernel": conv_w(tblock.mlp.leconv.partial_conv3.weight)}
        }
    return p


def _basic_layer(tlayer, local_enhence):
    # transformer.py wraps blocks in BasicLayer(.blocks ModuleList);
    # raletransformer.py (the nra model) uses bare nn.Sequential stages
    # (reference raletransformer.py:573-634) — index directly there.
    blocks = getattr(tlayer, "blocks", tlayer)
    return {
        f"blocks_{j}": _block_params(blocks[j], local_enhence)
        for j in range(len(blocks))
    }


def _patch_op(tmod):
    return {"norm": ln(tmod.norm), "reduction": dense(tmod.reduction)}


def ralenet_variables(tm, high_enh: bool, has_bias: bool = True) -> dict:
    """Reference ralenet module -> our RaleNet variables.

    Handles the reference's dtransformer34/utranformer3 attr-name typos.
    has_bias=False for the no-R-wave-attention variant
    (model/raletransformer.py ralenet, which has no rwattn tables).
    """
    enc_names = {1: "dtransformer1", 2: "dtransformer2",
                 3: "dtransformer3", 4: "dtransformer34"}
    dec_names = {4: "utransformer4", 3: "utranformer3",
                 2: "utransformer2", 1: "utransformer1"}
    params = {
        "conv1_conv": {"kernel": conv_w(tm.conv1[0].weight), "bias": vec(tm.conv1[0].bias)},
        "conv1_bn": {"scale": vec(tm.conv1[2].weight), "bias": vec(tm.conv1[2].bias)},
        "transconv": {"kernel": conv_w(tm.transconv[0].weight), "bias": vec(tm.transconv[0].bias)},
        "transformer": _basic_layer(tm.transformer, high_enh),
    }
    stats = {
        "conv1_bn": {"mean": vec(tm.conv1[2].running_mean),
                     "var": vec(tm.conv1[2].running_var)},
    }
    for n in range(1, 5):
        if has_bias:
            params[f"rwattn{n}"] = {
                "relative_position_bias_table": vec(
                    getattr(tm, f"rwattn{n}").relative_position_bias_table)
            }
        params[f"dtransformer{n}"] = _basic_layer(getattr(tm, enc_names[n]), high_enh)
        params[f"utransformer{n}"] = _basic_layer(getattr(tm, dec_names[n]), high_enh)
        params[f"pm{n}"] = _patch_op(getattr(tm, f"pm{n}"))
        params[f"ps{n}"] = _patch_op(getattr(tm, f"ps{n}"))
    return {"params": params, "batch_stats": stats}


def newrale_variables(tm) -> dict:
    """Reference newrale (12-lead adapters around a frozen ralenet core)."""
    core = tm.rale  # reference ralenet_12leads.py:684
    inner = ralenet_variables(core, True)
    params = {
        "rale": inner["params"],
        "conv1": {"kernel": conv_w(tm.conv1.weight), "bias": vec(tm.conv1.bias)},
        "conv2": {"kernel": conv_w(tm.conv2.weight), "bias": vec(tm.conv2.bias)},
        "conv3": {"kernel": conv_w(tm.conv3.weight), "bias": vec(tm.conv3.bias)},
        "conv4": {"kernel": conv_w(tm.conv4.weight), "bias": vec(tm.conv4.bias)},
    }
    return {"params": params, "batch_stats": {"rale": inner["batch_stats"]}}


# --- .pth checkpoint import (migration path) ---------------------------------

_VARIABLES_FN = {
    0: unet_variables,
    1: seq2seq2_variables,
    2: lambda tm: ralenet_variables(tm, high_enh=True, has_bias=False),
    3: lambda tm: ralenet_variables(tm, high_enh=False),
    4: lambda tm: ralenet_variables(tm, high_enh=True),
    5: acdae_variables,
}


def variables_from_state_dict(model_index: int, state_dict) -> dict:
    """Import a reference `.pth` state_dict (torch.save(model.state_dict()),
    reference denoise_train.py:93) into our flax variables tree.

    Builds the reference module, loads the state_dict, then runs the
    layout mapping — so users can migrate trained reference checkpoints.
    """
    tm = build_reference_model(model_index)
    tm.load_state_dict(state_dict)
    tm.eval()
    return _VARIABLES_FN[model_index](tm)


def variables_from_torch_model(model_index: int, tm) -> dict:
    """Map a live reference module's current weights into flax variables."""
    return _VARIABLES_FN[model_index](tm)
