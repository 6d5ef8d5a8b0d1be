"""12-lead transfer-learning wrapper (reference: model/ralenet_12leads.py:680-709).

`NewRale` compresses 12 leads to the 2-lead space of a pretrained RA-LENet
core (12->6->2 convs, k13), runs the core, and expands back (2->6->12).
The reference freezes the core's parameters (requires_grad=False,
ralenet_12leads.py:694-696); in this framework freezing is expressed at the
optimizer level — `frozen_param_mask` marks the core's subtree for
optax.set_to_zero, which the training loop applies (see train/steps.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ecg_denoise_tpu.ops.layers import Conv1d
from ecg_denoise_tpu.models.ralenet import RaleNet


class NewRale(nn.Module):
    variant: str = "full"
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def in_channels(self) -> int:
        """Served window channel count (12-lead; every other family is 2 —
        serving.Denoiser derives its bucket shapes from this)."""
        return 12

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, 12, L)
        lrelu = lambda h: nn.leaky_relu(h, negative_slope=0.01)
        x = lrelu(Conv1d(6, 13, padding=6, dtype=self.dtype, name="conv1")(x))
        x = lrelu(Conv1d(2, 13, padding=6, dtype=self.dtype, name="conv2")(x))
        # Frozen pretrained core: BN in inference mode (train=False), matching
        # the reference's frozen module still being called in .train() mode —
        # torch BN would still update running stats there; we deliberately fix
        # the core's BN to eval semantics (documented deviation: the frozen
        # core should be genuinely frozen).
        x = RaleNet(variant=self.variant, use_pallas=self.use_pallas,
                    dtype=self.dtype, name="rale")(x, train=False)
        x = lrelu(Conv1d(6, 13, padding=6, dtype=self.dtype, name="conv3")(x))
        return Conv1d(12, 13, padding=6, dtype=self.dtype, name="conv4")(x)


def frozen_param_mask(params) -> dict:
    """True where parameters must be frozen (the pretrained core subtree)."""
    import jax

    flat = jax.tree_util.tree_map_with_path(
        lambda path, _: any(getattr(p, "key", None) == "rale" for p in path), params
    )
    return flat
