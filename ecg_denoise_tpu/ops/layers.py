"""Core 1-D layers with PyTorch-compatible semantics, lowered to XLA TPU ops.

Layout convention: conv/norm layers operate on (B, C, L) — the reference's
torch layout — so model code reads like the architecture descriptions.
Internally everything lowers to `lax.conv_general_dilated` with explicit
dimension numbers; XLA picks TPU-optimal layouts and fuses the elementwise
tails, so no transposes materialize in HBM.

Torch-compat notes (each matters for parity with the reference models):
* Conv1d: cross-correlation, torch padding/stride arithmetic.
* ConvTranspose1d: exact torch semantics via lhs_dilation + flipped kernel;
  out_len = (L-1)*stride - 2*pad + k (+output_padding).
* BatchNorm1d: eps 1e-5, momentum 0.1 (new = 0.9*old + 0.1*batch), biased
  batch variance for normalization, running stats updated with *unbiased*
  variance — matching torch exactly.
* LayerNorm: eps 1e-5 (flax default is 1e-6).
* linear_upsample2x: torch nn.Upsample(scale_factor=2, mode='linear',
  align_corners=False) resampling grid.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ecg_denoise_tpu.utils.init import (
    torch_kernel_init,
    torch_bias_init,
    torch_tconv_kernel_init,
)

# (B, C, L) convolution dimension numbers.
_DN = ("NCH", "HIO", "NCH")


def _precision(dtype):
    """float32 compute -> exact (HIGHEST) MXU passes for torch parity;
    bfloat16 compute -> native MXU speed."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def _dense_pack_factor(rows: int, c_in: int, c_out: int) -> int:
    """Lane-packing factor for tiny Dense layers.

    RA-LENet's channel widths (8..128) leave a (rows, C) x (C, C) matmul
    using C/128 of each MXU tile in BOTH the contraction and lane dims
    (SURVEY §7 "tiny-dims efficiency" risk; measured in the round-3
    ablation profile: the non-attention forward runs at ~8% MFU). Packing
    P row-groups against a block-diagonal kron(I_P, W) kernel makes the
    matmul (rows/P, P*C) x (P*C, P*C): full 128-wide tiles, P times fewer
    output tiles. The off-diagonal weight blocks are exact zeros, so the
    result matches up to summation-order rounding (x*0.0 terms cannot
    perturb any partial sum; only the reduction-tree pairing of the C
    real terms changes — ulp scale); the tile economics change.
    """
    import os

    if os.environ.get("ECG_DENSE_PACK", "1") == "0":  # A/B escape hatch
        return 1
    cmax = max(c_in, c_out, 1)
    if cmax >= 128:
        return 1
    P = 128 // cmax
    P = 1 << (P.bit_length() - 1)  # round down to a power of two
    while P > 1 and rows % P:
        P //= 2
    return P


class Dense(nn.Module):
    """nn.Linear-compatible Dense (torch init, optional bias).

    lane_pack=True applies block-diagonal MXU packing for tiny feature
    dims — see _dense_pack_factor. Parameter layout is unchanged
    (checkpoints/interop unaffected); results match at ulp scale
    (summation-order rounding only).

    MEASURED OFF by default (round-3 A/B, runs/r3_ab.log): on v5e at batch
    2048 the packed model runs 16.8k w/s vs 55.2k unpacked — XLA's
    physical layout lane-pads the C=8..64 activations, so the logical
    (B*L, C) -> (B*L/P, P*C) pack/unpack reshapes are HBM relayouts
    (lane shuffles) on every Dense boundary, and that traffic swamps the
    8-16x tile-economics win. The same block-diagonal idea DOES pay
    inside the attention kernel, where the relayout happens in VMEM
    (kernels/attention_pallas.py _pack_factor).
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    lane_pack: bool = False

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init, (in_features, self.features), jnp.float32)
        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        P = (_dense_pack_factor(rows, in_features, self.features)
             if self.lane_pack else 1)
        if P > 1:
            kp = jnp.kron(jnp.eye(P, dtype=self.dtype), kernel.astype(self.dtype))
            y = jnp.dot(x.reshape(rows // P, P * in_features).astype(self.dtype),
                        kp, precision=_precision(self.dtype))
            y = y.reshape(*x.shape[:-1], self.features)
        else:
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                        precision=_precision(self.dtype))
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(in_features), (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class Conv1d(nn.Module):
    """torch.nn.Conv1d equivalent on (B, C, L)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[1]
        # Kernel stored as (k, in_ch/groups, out_ch) = flax 'HIO'.
        kshape = (self.kernel_size, in_ch // self.groups, self.features)
        kernel = self.param("kernel", torch_kernel_init, kshape, jnp.float32)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=_DN,
            feature_group_count=self.groups,
            precision=_precision(self.dtype),
        )
        if self.use_bias:
            fan_in = (in_ch // self.groups) * self.kernel_size
            bias = self.param("bias", torch_bias_init(fan_in), (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)[None, :, None]
        return y


class ConvTranspose1d(nn.Module):
    """torch.nn.ConvTranspose1d equivalent on (B, C, L).

    Implemented as the mathematical transpose of Conv1d: input dilation by
    `stride`, padding (k-1-p, k-1-p+output_padding), spatially-flipped
    kernel with in/out channels swapped.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[1]
        k = self.kernel_size
        # torch stores (in_ch, out_ch, k); kept here as HIO (k, in_ch, out_ch)
        # (same tensor, axes permuted — see tests/oracle weight mapping).
        kshape = (k, in_ch, self.features)
        # torch ConvTranspose fan_in is out_ch*k (weight (in, out, k),
        # fan_in = size(1)*receptive) — NOT the in_ch*k of a regular conv.
        kernel = self.param("kernel", torch_tconv_kernel_init, kshape, jnp.float32)
        # conv_general_dilated computes correlation; the transpose of a
        # correlation is a convolution -> flip the spatial axis.
        kernel_t = jnp.flip(kernel, axis=0)
        pad = k - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel_t.astype(self.dtype),
            window_strides=(1,),
            padding=[(pad, pad + self.output_padding)],
            lhs_dilation=(self.stride,),
            dimension_numbers=_DN,
            precision=_precision(self.dtype),
        )
        if self.use_bias:
            fan_in = self.features * k  # torch ConvTranspose fan_in
            bias = self.param("bias", torch_bias_init(fan_in), (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)[None, :, None]
        return y


class BatchNorm1d(nn.Module):
    """torch.nn.BatchNorm1d on (B, C, L) or (B, C): feature axis 1."""

    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = False):
        features = x.shape[1]
        reduce_axes = (0,) if x.ndim == 2 else (0, 2)
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((features,), jnp.float32))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            var = jnp.mean((xf - _expand(mean, x.ndim)) ** 2, axis=reduce_axes)
            if not self.is_initializing():
                n = 1
                for ax in reduce_axes:
                    n *= x.shape[ax]
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - _expand(mean, x.ndim)) * _expand(inv, x.ndim) + _expand(
            bias, x.ndim
        )
        return y.astype(self.dtype)


def _expand(v, ndim):
    return v[None, :, None] if ndim == 3 else v[None, :]


class LayerNorm(nn.Module):
    """torch-eps LayerNorm over the last axis."""

    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(self.dtype)


class PartialConv1d(nn.Module):
    """FasterNet partial conv (reference: model/transformer.py:16-59).

    Convolves only the first dim//n_div channels (k=3, pad=1, no bias); the
    rest pass through untouched. The reference instantiates it with
    n_div == dim, so exactly ONE channel is convolved — quirk preserved by
    construction.

    Input here is (B, C, L) (the caller transposes; see Mlp/LeFF).
    """

    dim: int
    n_div: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim_conv = self.dim // self.n_div
        x1 = x[:, :dim_conv, :]
        x2 = x[:, dim_conv:, :]
        x1 = Conv1d(dim_conv, 3, padding=1, use_bias=False, dtype=self.dtype, name="partial_conv3")(x1)
        return jnp.concatenate([x1, x2], axis=1)


class EcaLayer1d(nn.Module):
    """ECA channel attention over (B, L, C) inputs (reference eca_layer_1d,
    model/transformer.py:100-113): GAP over L, k-tap conv across channels,
    sigmoid gate."""

    k_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, L, C)
        y = jnp.mean(x, axis=1, keepdims=True)  # (B, 1, C) == GAP over length
        y = Conv1d(1, self.k_size, padding=(self.k_size - 1) // 2, use_bias=False, dtype=self.dtype)(y)
        y = jax.nn.sigmoid(y)  # (B, 1, C)
        return x * y


def max_pool1d(x: jnp.ndarray, window: int = 2, stride: int | None = None) -> jnp.ndarray:
    """torch.nn.MaxPool1d on (B, C, L)."""
    stride = stride or window
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, window), (1, 1, stride), "VALID"
    )


def adaptive_avg_pool1d(x: jnp.ndarray) -> jnp.ndarray:
    """torch AdaptiveAvgPool1d(1) on (B, C, L) -> (B, C, 1)."""
    return jnp.mean(x, axis=-1, keepdims=True)


def linear_upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """torch nn.Upsample(scale_factor=2, mode='linear', align_corners=False)
    on (B, C, L) -> (B, C, 2L)."""
    L = x.shape[-1]
    src = (jnp.arange(2 * L, dtype=jnp.float32) + 0.5) / 2.0 - 0.5
    lo = jnp.clip(jnp.floor(src), 0, L - 1).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, L - 1)
    w = jnp.clip(src - lo.astype(jnp.float32), 0.0, 1.0)
    return x[..., lo] * (1.0 - w) + x[..., hi] * w
