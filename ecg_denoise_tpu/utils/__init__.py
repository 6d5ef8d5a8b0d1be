from ecg_denoise_tpu.utils.init import torch_kernel_init, torch_bias_init

__all__ = ["torch_kernel_init", "torch_bias_init"]
