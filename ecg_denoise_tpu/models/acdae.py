"""Attention-based Convolutional Denoising AutoEncoder
(reference: model/ACDAE.py:62-86).

Encoder: 4x [conv(k 13/7/7/7, same pad) -> maxpool(2) -> LeakyReLU],
channels 2->16->32->64->128. Decoder: 4x [ConvTranspose(k, s1, same pad) ->
linear Upsample(x2) -> LeakyReLU -> ECA channel attention], with additive
skips after decoder stages 1-3 (the final stage's ECA output is returned
directly).
"""

from __future__ import annotations

import jax.numpy as jnp
import jax
import flax.linen as nn

from ecg_denoise_tpu.ops.layers import (
    Conv1d,
    ConvTranspose1d,
    max_pool1d,
    linear_upsample2x,
    adaptive_avg_pool1d,
)


class ECAModule(nn.Module):
    """ECA on (B, C, L): GAP over L -> k3 conv across channels -> sigmoid gate
    (reference ACDAE.py:9-23)."""

    k_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = adaptive_avg_pool1d(x)  # (B, C, 1)
        y = y.transpose(0, 2, 1)  # (B, 1, C)
        y = Conv1d(1, self.k_size, padding=1, use_bias=False, dtype=self.dtype, name="conv")(y)
        y = y.transpose(0, 2, 1)  # (B, C, 1)
        return x * jax.nn.sigmoid(y)


class ACDAE(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        channels = [2, 16, 32, 64, 128]
        ksize = [13, 7, 7, 7]

        def enc(i, h):
            h = Conv1d(channels[i + 1], ksize[i], padding=(ksize[i] - 1) // 2,
                       dtype=self.dtype, name=f"enc{i}_conv")(h)
            return nn.leaky_relu(max_pool1d(h), negative_slope=0.01)

        def dec(i, h):
            out_ch = channels[-(i + 2)]
            k = ksize[-(i + 1)]
            h = ConvTranspose1d(out_ch, k, padding=(k - 1) // 2,
                                dtype=self.dtype, name=f"dec{i}_conv")(h)
            h = nn.leaky_relu(linear_upsample2x(h), negative_slope=0.01)
            return ECAModule(dtype=self.dtype, name=f"dec{i}_eca")(h)

        skips = []
        for i in range(3):
            x = enc(i, x)
            skips.append(x)
        x = enc(3, x)
        for i in range(3):
            x = dec(i, x) + skips[-(i + 1)]
        return dec(3, x)
