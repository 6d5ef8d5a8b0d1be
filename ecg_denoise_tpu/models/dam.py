"""DANet / DACNN family — dual-attention conv denoiser
(reference: model/DAM.py:12-156,283-350).

Seq2Seq2 = DeNoiseEnc (4 strided EncoderCells, k 17/17/3/3, ch 4/8/16/32,
APReLU activations, BN) -> DeNoiseDec (4 ConvTranspose DecoderCells,
k 4/4/18/18, ch 16/8/4/2, APReLU + BN + DAM dual attention except the last),
with trunc-aligned additive skips (alignment_add, DAM.py:283-308).

The reference's older Seq2Seq/EncBlock/DecBlock (DAM.py:193-281) are unused
by the entry scripts and not carried over.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ecg_denoise_tpu.ops.layers import (
    Conv1d,
    ConvTranspose1d,
    BatchNorm1d,
    Dense,
    adaptive_avg_pool1d,
)


class APReLU(nn.Module):
    """Adaptively Parametric ReLU (reference DAM.py:12-48): the negative
    slope is a per-sample, per-channel sigmoid gate computed by an FCN over
    GAP(pos) || GAP(neg)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, C, L)
        pos = jnp.maximum(x, 0.0)
        neg = jnp.minimum(x, 0.0)
        gap_p = adaptive_avg_pool1d(pos)[..., 0]  # (B, C)
        gap_n = adaptive_avg_pool1d(neg)[..., 0]
        h = jnp.concatenate([gap_p, gap_n], axis=1)  # (B, 2C)
        h = Dense(2 * self.channels, dtype=self.dtype, name="fc1")(h)
        h = BatchNorm1d(dtype=self.dtype, name="bn1")(h, use_running_average=not train)
        h = jax.nn.relu(h)
        h = Dense(self.channels, dtype=self.dtype, name="fc2")(h)
        h = BatchNorm1d(dtype=self.dtype, name="bn2")(h, use_running_average=not train)
        gate = jax.nn.sigmoid(h)  # (B, C)
        return pos + gate[:, :, None] * neg


class DAM(nn.Module):
    """Dual Attention Module (reference DAM.py:101-156): channel attention =
    sigmoid(FCN1(GAP) + FCN2(GMP)); spatial attention = sigmoid(1x1 conv over
    [avg_c, max_c]). Note the reference builds fcn1 and fcn2 from the SAME
    layer list, so they share parameters — preserved here by applying one
    FCN to both pooled vectors."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, C, L)
        fc1 = Dense(self.channels, dtype=self.dtype, name="fcn_fc1")
        bn1 = BatchNorm1d(dtype=self.dtype, name="fcn_bn1")
        fc2 = Dense(self.channels, dtype=self.dtype, name="fcn_fc2")
        bn2 = BatchNorm1d(dtype=self.dtype, name="fcn_bn2")

        def fcn(h, train):
            h = bn1(fc1(h), use_running_average=not train)
            h = jax.nn.relu(h)
            h = bn2(fc2(h), use_running_average=not train)
            return jax.nn.sigmoid(h)

        gap = jnp.mean(x, axis=-1)  # (B, C)
        gmp = jnp.max(x, axis=-1)
        c_attn = jax.nn.sigmoid(fcn(gap, train) + fcn(gmp, train))[:, :, None]  # (B, C, 1)

        cap = jnp.mean(x, axis=1, keepdims=True)  # (B, 1, L)
        cmp_ = jnp.max(x, axis=1, keepdims=True)
        cat = jnp.concatenate([cap, cmp_], axis=1)  # (B, 2, L)
        s_attn = jax.nn.sigmoid(Conv1d(1, 1, dtype=self.dtype, name="convsa")(cat))  # (B, 1, L)
        return x * c_attn * s_attn


class EncoderCell(nn.Module):
    features: int
    kernel_size: int
    padding: int
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv1d(self.features, self.kernel_size, stride=self.stride,
                   padding=self.padding, dtype=self.dtype, name="conv")(x)
        x = APReLU(self.features, dtype=self.dtype, name="aprelu")(x, train)
        return BatchNorm1d(dtype=self.dtype, name="bn")(x, use_running_average=not train)


class DecoderCell(nn.Module):
    features: int
    kernel_size: int
    padding: int
    stride: int = 2
    last: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvTranspose1d(self.features, self.kernel_size, stride=self.stride,
                            padding=self.padding, dtype=self.dtype, name="deconv")(x)
        x = APReLU(self.features, dtype=self.dtype, name="aprelu")(x, train)
        x = BatchNorm1d(dtype=self.dtype, name="bn")(x, use_running_average=not train)
        if not self.last:
            x = DAM(self.features, dtype=self.dtype, name="dam")(x, train)
        return x


def alignment_add(t1: jnp.ndarray, t2: jnp.ndarray) -> jnp.ndarray:
    """Truncating skip-add (reference alignment_add, DAM.py:283-308)."""
    n = min(t1.shape[-1], t2.shape[-1])
    return t1[..., :n] + t2[..., :n]


class Seq2Seq2(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        enc_k = [17, 17, 3, 3]
        enc_p = [8, 8, 1, 1]
        enc_c = [4, 8, 16, 32]
        dec_k = [4, 4, 18, 18]
        dec_p = [1, 1, 8, 8]
        dec_c = [16, 8, 4, 2]

        feats = []
        for i in range(4):
            x = EncoderCell(enc_c[i], enc_k[i], enc_p[i], dtype=self.dtype, name=f"enc{i}")(x, train)
            feats.append(x)

        y = DecoderCell(dec_c[0], dec_k[0], dec_p[0], dtype=self.dtype, name="dec0")(feats[-1], train)
        y = DecoderCell(dec_c[1], dec_k[1], dec_p[1], dtype=self.dtype, name="dec1")(
            alignment_add(y, feats[-2]), train
        )
        y = DecoderCell(dec_c[2], dec_k[2], dec_p[2], dtype=self.dtype, name="dec2")(
            alignment_add(y, feats[-3]), train
        )
        y = DecoderCell(dec_c[3], dec_k[3], dec_p[3], last=True, dtype=self.dtype, name="dec3")(
            alignment_add(y, feats[-4]), train
        )
        return y
