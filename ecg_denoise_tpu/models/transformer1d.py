"""Transformer1d — hierarchical transformer sequence classifier.

Equivalent of the reference's unused-but-public `Transformer1d`
(reference model/raletransformer.py:504-555): 1x1 conv embed to embed_dim,
4 stages of [BasicLayer(depth blocks) + PatchMerging between stages] with
channels doubling (128/256/512/1024) and heads 4/8/16/32, final LayerNorm,
global average pool, linear head.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from ecg_denoise_tpu.ops.layers import Conv1d, LayerNorm, Dense
from ecg_denoise_tpu.ops.attention import BasicLayer, PatchMerging


class Transformer1d(nn.Module):
    num_class: int = 9
    in_channels: int = 32
    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    mlp_ratio: float = 4.0
    local_enhence: bool = False
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, C, L)
        h = Conv1d(self.embed_dim, 1, dtype=self.dtype, name="embed")(x)
        h = h.transpose(0, 2, 1)  # (B, L, C)
        n_stages = len(self.depths)
        for i in range(n_stages):
            dim = self.embed_dim * 2**i
            h = BasicLayer(
                dim=dim,
                depth=self.depths[i],
                num_heads=self.num_heads[i],
                mlp_ratio=self.mlp_ratio,
                local_enhence=self.local_enhence,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                name=f"layer{i}",
            )(h)
            if i < n_stages - 1:
                h = PatchMerging(dim, dtype=self.dtype, name=f"merge{i}")(h)
        h = LayerNorm(dtype=self.dtype, name="norm")(h)
        h = jnp.mean(h, axis=1)  # GAP over length
        return Dense(self.num_class, dtype=self.dtype, name="head")(h)
