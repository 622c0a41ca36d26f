from .metrics import (
    psnr,
    ms_ssim,
    SegmentationMetric,
    compute_map,
    csv_eval_ap,
)

__all__ = [
    "psnr",
    "ms_ssim",
    "SegmentationMetric",
    "compute_map",
    "csv_eval_ap",
]
