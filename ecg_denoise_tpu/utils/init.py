"""PyTorch-compatible parameter initializers.

The reference trains with torch defaults (kaiming_uniform(a=sqrt(5)) for
Linear/Conv kernels, U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for biases), which
reduce to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both. Flax defaults
(lecun_normal, zero bias) would subtly change training dynamics, so models
here default to these torch-style initializers to keep SNR trajectories
comparable with the reference baselines.
"""

from __future__ import annotations

import numpy as np
import jax


def _fan_in_from_kernel_shape(shape) -> int:
    # flax Dense kernel: (in, out); flax Conv kernel: (k..., in, out)
    if len(shape) == 2:
        return shape[0]
    receptive = int(np.prod(shape[:-2]))
    return receptive * shape[-2]


def torch_kernel_init(key, shape, dtype):
    bound = 1.0 / np.sqrt(_fan_in_from_kernel_shape(shape))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_tconv_kernel_init(key, shape, dtype):
    """ConvTranspose kernel init: torch stores (in, out, k) and
    kaiming_uniform's fan_in is size(1)*receptive = OUT_ch * k — not the
    in_ch*k a regular conv uses. Our HIO shape is (k, in, out), so use
    shape[-1] (out) * receptive."""
    receptive = int(np.prod(shape[:-2]))
    bound = 1.0 / np.sqrt(receptive * shape[-1])
    return jax.random.uniform(key, shape, dtype, -bound, bound)
