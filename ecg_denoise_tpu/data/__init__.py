from ecg_denoise_tpu.data.noise import (
    gnoisegen,
    single_snr_noise_add,
    batch_snr_noise_add,
    jax_snr_noise_add,
)
from ecg_denoise_tpu.data.dataset import EcgDataset, load_split_arrays
from ecg_denoise_tpu.data.synth import synth_ecg_record, synth_noise_record

__all__ = [
    "gnoisegen",
    "single_snr_noise_add",
    "batch_snr_noise_add",
    "jax_snr_noise_add",
    "EcgDataset",
    "load_split_arrays",
    "synth_ecg_record",
    "synth_noise_record",
]
