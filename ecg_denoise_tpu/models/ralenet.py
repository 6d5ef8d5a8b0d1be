"""RA-LENet — LE-Transformer U-Net with R-wave attention, TPU-native.

Re-designed from the reference family (reference: model/transformer.py:560-667
full/mlp variants; model/raletransformer.py:559-683 nra variant;
identical-topology copy in model/ralenet_12leads.py):

    conv stem 2->8 (k3) + LeakyReLU(0.2) + BatchNorm
    4 encoder stages: [2 TransformerBlocks -> PatchMerging], C 8->128, L 256->16
    2-block bottleneck + residual
    4 decoder stages: [2 TransformerBlocks -> PatchSeparate] + encoder skips
    conv head 8->2 (k3)

Variant table (maps the reference's three entry configs, main.py:69-77):
    'nra'  — no R-wave rel-pos bias anywhere; LeFF local enhance ON
             (raletransformer.py Mlp default local_enhence=True).
    'mlp'  — R-wave bias ON; plain MLP FFN (transformer.py with
             high_level_enhence=False; the reference's `low_level_enhence`
             flag is accepted but never read — transformer.py:562 — so
             'ralenet_mlp' differs from 'full' only via high_level_enhence).
    'full' — R-wave bias ON; LeFF local enhance ON (high_level_enhence=True).

Mask wiring matches the reference forward exactly (transformer.py:621-667):
encoder stages get biases for W=32/16/8/4; the bottleneck and the FIRST
decoder stage get none; decoder stages 3/2/1 reuse biases attn4/attn3/attn2
(one scale coarser than their mirror — reference quirk preserved).

`r_pos` (optional, int or traced scalar array): R-peak sample position in
the 256-sample window; each stage re-centres its bias window at r_pos/2^i
(the reference's R_pos hook, transformer.py:534-543).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ecg_denoise_tpu.ops.layers import Conv1d, BatchNorm1d
from ecg_denoise_tpu.ops.attention import (
    BasicLayer,
    PatchMerging,
    PatchSeparate,
    RelativePositionEmbedding,
)

VARIANTS = ("nra", "mlp", "full")


class RaleNet(nn.Module):
    variant: str = "full"
    depth: int = 2
    mlp_ratio: float = 4.0
    use_remat: bool = False
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, r_pos: Optional[jnp.ndarray] = None):
        assert self.variant in VARIANTS, f"variant must be one of {VARIANTS}"
        channels = [2 ** (i + 3) for i in range(5)]  # 8..128
        heads = [2 ** (i + 1) for i in range(5)]  # 2..32
        lengths = [2 ** (8 - i) for i in range(5)]  # 256..16
        windows = [32, 16, 8, 4]
        local_enhence = self.variant in ("nra", "full")
        use_bias = self.variant in ("mlp", "full")

        def layer(dim, num_heads, name):
            return BasicLayer(
                dim=dim,
                depth=self.depth,
                num_heads=num_heads,
                mlp_ratio=self.mlp_ratio,
                local_enhence=local_enhence,
                use_remat=self.use_remat,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                name=name,
            )

        # --- conv stem (reference transformer.py:570-574) ---
        h = Conv1d(channels[0], 3, padding=1, dtype=self.dtype, name="conv1_conv")(x)
        h = nn.leaky_relu(h, negative_slope=0.2)
        h = BatchNorm1d(dtype=self.dtype, name="conv1_bn")(h, use_running_average=not train)
        stem = h  # (B, 8, 256)

        # --- R-wave rel-pos biases (reference transformer.py:576-579,625-628) ---
        attn = [None, None, None, None]
        if use_bias:
            for i in range(4):
                rp = None if r_pos is None else r_pos // (2**i)
                attn[i] = RelativePositionEmbedding(
                    length=windows[i],
                    whole_length=lengths[i],
                    num_heads=heads[i],
                    dtype=self.dtype,
                    name=f"rwattn{i + 1}",
                )(rp)

        # --- encoder ---
        h = stem.transpose(0, 2, 1)  # (B, L, C)
        skips = []
        for i in range(4):
            h = layer(channels[i], heads[i], f"dtransformer{i + 1}")(h, attn[i])
            h = PatchMerging(channels[i], dtype=self.dtype, name=f"pm{i + 1}")(h)
            skips.append(h)  # post-merge skip, matching reference x1..x4

        # --- bottleneck (no bias; reference transformer.py:644-646) ---
        h = layer(channels[4], heads[4], "transformer")(skips[3]) + skips[3]

        # --- decoder (mask schedule per reference forward, :648-662) ---
        dec_masks = [None, attn[3], attn[2], attn[1]]
        for j, i in enumerate(range(4, 0, -1)):  # stages 4,3,2,1
            h = layer(channels[i], heads[i], f"utransformer{i}")(h, dec_masks[j])
            h = PatchSeparate(channels[i], dtype=self.dtype, name=f"ps{i}")(h)
            if i > 1:
                h = h + skips[i - 2]

        # --- head (reference transformer.py:664-667) ---
        h = h.transpose(0, 2, 1) + stem  # (B, 8, 256)
        return Conv1d(2, 3, padding=1, dtype=self.dtype, name="transconv")(h)
