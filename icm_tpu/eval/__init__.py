from .metrics import psnr, ms_ssim, SegmentationMetric, compute_map

__all__ = ["psnr", "ms_ssim", "SegmentationMetric", "compute_map"]
