from ecg_denoise_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate_state,
    tp_param_spec,
    shard_state_dp_tp,
)
from ecg_denoise_tpu.parallel import multihost

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate_state",
    "tp_param_spec",
    "shard_state_dp_tp",
    "multihost",
]
