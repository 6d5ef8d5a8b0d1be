"""1-D conv U-Net denoiser (reference: model/UNet.py:96-141).

Channels 2->4->8->16->32 via four stride-2 EncBlocks (conv k3 + BN +
LeakyReLU), a 1x1/3x3/1x1 conv bottleneck with residual, and four
ConvTranspose (k4, s2, p1) DecBlocks with additive skips; the final
DecBlock has no activation (use_relu=False). The reference's unused
Resbottleneck/DUblock helpers (UNet.py:8-44) are intentionally not carried
over.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ecg_denoise_tpu.ops.layers import Conv1d, ConvTranspose1d, BatchNorm1d


class EncBlock(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv1d(self.features, self.kernel_size, stride=self.stride,
                   padding=self.padding, dtype=self.dtype, name="conv")(x)
        x = BatchNorm1d(dtype=self.dtype, name="bn")(x, use_running_average=not train)
        return nn.leaky_relu(x, negative_slope=0.01)


class DecBlock(nn.Module):
    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvTranspose1d(self.features, self.kernel_size, stride=self.stride,
                            padding=self.padding, dtype=self.dtype, name="conv")(x)
        x = BatchNorm1d(dtype=self.dtype, name="bn")(x, use_running_average=not train)
        if self.use_relu:
            x = nn.leaky_relu(x, negative_slope=0.01)
        return x


class UNet(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        channels = [2 ** (n + 1) for n in range(5)]  # 2,4,8,16,32

        skips = []
        for i in range(3):
            x = EncBlock(channels[i + 1], dtype=self.dtype, name=f"enc{i}")(x, train)
            skips.append(x)
        x = EncBlock(channels[4], dtype=self.dtype, name="enc3")(x, train)

        # Bottleneck: conv1 -> LReLU -> BN -> conv3 -> LReLU -> BN -> conv1, + residual.
        h = Conv1d(channels[4], 1, dtype=self.dtype, name="bottleneck_conv0")(x)
        h = nn.leaky_relu(h, negative_slope=0.01)
        h = BatchNorm1d(dtype=self.dtype, name="bottleneck_bn0")(h, use_running_average=not train)
        h = Conv1d(channels[4], 3, padding=1, dtype=self.dtype, name="bottleneck_conv1")(h)
        h = nn.leaky_relu(h, negative_slope=0.01)
        h = BatchNorm1d(dtype=self.dtype, name="bottleneck_bn1")(h, use_running_average=not train)
        h = Conv1d(channels[4], 1, dtype=self.dtype, name="bottleneck_conv2")(h)
        x = h + x

        for i in range(3):
            x = DecBlock(channels[-(i + 2)], dtype=self.dtype, name=f"dec{i}")(x, train)
            x = x + skips[-(i + 1)]
        return DecBlock(channels[0], use_relu=False, dtype=self.dtype, name="dec3")(x, train)
