"""Downstream arrhythmia beat classifier (reference: model/ResNet_cls.py:12-67).

Conv7/s2 stem -> 4 stages of Bottleneck1d blocks (2,3,3,3) with stride-2
conv downsamples between stages (channels 32/64/128/256) -> global mean pool
-> MLP(256->512->2).

`Bottleneck1d` lives in the reference's *external* `global_utils` package
(ResNet_cls.py:9) whose source is not in the repo; it is reconstructed here
as the standard 1-D ResNet bottleneck (1x1 reduce -> 3x3 -> 1x1 expand with
BN+ReLU and identity residual; planes == inplanes in every reference usage,
so overall expansion is 1 and the reduction width is planes // 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ecg_denoise_tpu.ops.layers import Conv1d, BatchNorm1d, Dense


class Bottleneck1d(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = max(self.planes // 4, 1)
        h = Conv1d(width, 1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = BatchNorm1d(dtype=self.dtype, name="bn1")(h, use_running_average=not train)
        h = jax.nn.relu(h)
        h = Conv1d(width, 3, stride=self.stride, padding=1, use_bias=False,
                   dtype=self.dtype, name="conv2")(h)
        h = BatchNorm1d(dtype=self.dtype, name="bn2")(h, use_running_average=not train)
        h = jax.nn.relu(h)
        h = Conv1d(self.planes, 1, use_bias=False, dtype=self.dtype, name="conv3")(h)
        h = BatchNorm1d(dtype=self.dtype, name="bn3")(h, use_running_average=not train)
        return jax.nn.relu(h + x)


class ResNetCls(nn.Module):
    in_channels: int = 2
    num_classes: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, 2, L)
        channels = [2 ** (i + 5) for i in range(4)]  # 32,64,128,256
        layers = [2, 3, 3, 3]

        x = Conv1d(channels[0], 7, stride=2, padding=3, use_bias=False,
                   dtype=self.dtype, name="init_conv")(x)
        for stage in range(4):
            for b in range(layers[stage]):
                x = Bottleneck1d(channels[stage], dtype=self.dtype,
                                 name=f"layer{stage + 1}_block{b}")(x, train)
            if stage < 3:
                x = Conv1d(channels[stage + 1], 3, stride=2, padding=1, use_bias=False,
                           dtype=self.dtype, name=f"downsample{stage + 1}")(x)
        x = jnp.mean(x, axis=2)  # (B, C)
        x = Dense(512, dtype=self.dtype, name="mlp_fc1")(x)
        x = jax.nn.relu(x)
        return Dense(self.num_classes, dtype=self.dtype, name="mlp_fc2")(x)
