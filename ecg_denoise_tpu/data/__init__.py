from ecg_denoise_tpu.data.noise import (
    gnoisegen,
    single_snr_noise_add,
    batch_snr_noise_add,
    jax_snr_noise_add,
)
from ecg_denoise_tpu.data.dataset import EcgDataset, load_split_arrays
from ecg_denoise_tpu.data.synth import (
    synth_ecg_record,
    synth_noise_record,
    synth_beat_windows,
)
from ecg_denoise_tpu.data.normalize import znorm, minmax_norm
from ecg_denoise_tpu.data.rpeaks import detect_r_peak, detect_r_peaks

# Reference-API aliases (reference class/function names).
Ecg_Dataset = EcgDataset  # local_utils/data_utils.py:88
Gnoisegen = gnoisegen  # local_utils/local_utils.py:86
np_norm = znorm  # local_utils/local_utils.py:261

__all__ = [
    "gnoisegen",
    "single_snr_noise_add",
    "batch_snr_noise_add",
    "jax_snr_noise_add",
    "EcgDataset",
    "Ecg_Dataset",
    "Gnoisegen",
    "np_norm",
    "load_split_arrays",
    "synth_ecg_record",
    "synth_noise_record",
    "synth_beat_windows",
    "znorm",
    "minmax_norm",
    "detect_r_peak",
    "detect_r_peaks",
]
