"""ecg_denoise_tpu — a TPU-native (JAX / XLA / Pallas / pjit) ECG denoising framework.

Re-designed from scratch with the capabilities of the RA-LENet reference
implementation (IJCNN 2024, "RA-LENet: R-Wave Attention and Local Enhancement
for Noise Reduction in ECG Signals"): six denoiser architectures, MIT-BIH +
NSTDB data pipeline, SNR/RMSE evaluation, classical DWT/FFT baselines, a
downstream arrhythmia-classifier utility benchmark, and 12-lead transfer
learning — all built TPU-first:

* whole-dataset device residency + `lax.scan` epochs (no per-step H2D),
* fused Pallas attention kernels for the RA-LENet transformer stack,
* `jax.sharding.Mesh` + jit-SPMD data/tensor parallel scaling,
* bfloat16 compute with float32 parameters and metrics.
"""

from ecg_denoise_tpu.version import __version__  # noqa: F401

NOISE_INTENSITIES = [-4, -2, 0, 2, 4]  # input SNR (dB); reference main.py:26
NOISE_TYPES = ["bw", "ma", "em", "emb"]  # reference main.py:27
MODEL_NAMES = ["unet", "DANet", "ralenet_nra", "ralenet_mlp", "ralenet", "ACDAE"]  # main.py:28
