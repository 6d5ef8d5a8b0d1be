from ecg_denoise_tpu.train.state import TrainState, create_train_state
from ecg_denoise_tpu.train.steps import make_epoch_fns
from ecg_denoise_tpu.train.loop import fit
from ecg_denoise_tpu.train.checkpoint import save_checkpoint, load_checkpoint, find_model

__all__ = [
    "TrainState",
    "create_train_state",
    "make_epoch_fns",
    "fit",
    "save_checkpoint",
    "load_checkpoint",
    "find_model",
]
