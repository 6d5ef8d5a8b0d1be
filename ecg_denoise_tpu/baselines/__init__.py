from ecg_denoise_tpu.baselines.dwt import wavelet_denoise, wavedec, waverec, daubechies_filters
from ecg_denoise_tpu.baselines.fft import fft_denoise

__all__ = ["wavelet_denoise", "wavedec", "waverec", "daubechies_filters", "fft_denoise"]
