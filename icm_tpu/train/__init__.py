from .losses import (
    RateDistortionLoss,
    DetectionICMLoss,
    SegmentationICMLoss,
    compute_bpp,
)
from .optim import make_optimizer, TrainState
from .checkpoint import save_checkpoint, load_checkpoint
from .schedule import ReduceLROnPlateau
from .steps import make_train_step, make_eval_step

__all__ = [
    "RateDistortionLoss",
    "DetectionICMLoss",
    "SegmentationICMLoss",
    "compute_bpp",
    "make_optimizer",
    "TrainState",
    "make_train_step",
    "save_checkpoint",
    "load_checkpoint",
    "ReduceLROnPlateau",
    "make_eval_step",
]
