"""Model registry matching the reference dispatcher (reference main.py:28,63-80):

    index 0: 'unet'         -> UNet
    index 1: 'DANet'        -> Seq2Seq2 (DACNN dual-attention family)
    index 2: 'ralenet_nra'  -> RaleNet(variant='nra')   (no R-wave attention)
    index 3: 'ralenet_mlp'  -> RaleNet(variant='mlp')   (plain-MLP FFN)
    index 4: 'ralenet'      -> RaleNet(variant='full')  (R-wave attn + LeFF)
    index 5: 'ACDAE'        -> ACDAE
"""

from ecg_denoise_tpu.models.unet import UNet
from ecg_denoise_tpu.models.acdae import ACDAE
from ecg_denoise_tpu.models.dam import Seq2Seq2, APReLU, DAM
from ecg_denoise_tpu.models.ralenet import RaleNet
from ecg_denoise_tpu.models.ralenet_12leads import NewRale
from ecg_denoise_tpu.models.resnet_cls import ResNetCls, Bottleneck1d
from ecg_denoise_tpu.models.transformer1d import Transformer1d

from ecg_denoise_tpu import MODEL_NAMES  # single source (package __init__)


def build_model(name_or_index, *, use_pallas: bool = False, dtype=None):
    """Instantiate a denoiser by reference name or --model_index."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    if isinstance(name_or_index, int):
        name = MODEL_NAMES[name_or_index]
    else:
        name = name_or_index
    if name == "unet":
        return UNet(dtype=dtype)
    if name == "DANet":
        return Seq2Seq2(dtype=dtype)
    if name == "ralenet_nra":
        return RaleNet(variant="nra", use_pallas=use_pallas, dtype=dtype)
    if name == "ralenet_mlp":
        return RaleNet(variant="mlp", use_pallas=use_pallas, dtype=dtype)
    if name == "ralenet":
        return RaleNet(variant="full", use_pallas=use_pallas, dtype=dtype)
    if name == "ACDAE":
        return ACDAE(dtype=dtype)
    if name == "newrale":
        # 12-lead transfer wrapper (reference model/ralenet_12leads.py:680-709);
        # not in the reference's index dispatch (its Transfer_learning.py
        # builds it directly), named here so serving can load its checkpoints.
        return NewRale(use_pallas=use_pallas, dtype=dtype)
    raise ValueError(f"unknown model {name!r}; choose from "
                     f"{MODEL_NAMES + ['newrale']}")


__all__ = [
    "UNet",
    "ACDAE",
    "Seq2Seq2",
    "APReLU",
    "DAM",
    "RaleNet",
    "NewRale",
    "ResNetCls",
    "Bottleneck1d",
    "Transformer1d",
    "MODEL_NAMES",
    "build_model",
]
