from ecg_denoise_tpu.metrics.denoise import (
    RMSE,
    SNR,
    snr_improvement,
    PRD,
    second_order_difference_loss,
)
from ecg_denoise_tpu.metrics.cls import accuracy, precision, f1_score

__all__ = [
    "RMSE",
    "SNR",
    "snr_improvement",
    "PRD",
    "second_order_difference_loss",
    "accuracy",
    "precision",
    "f1_score",
]
