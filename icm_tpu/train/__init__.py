from .losses import RateDistortionLoss, compute_bpp
from .optim import make_optimizer, TrainState
from .steps import make_train_step, make_eval_step

__all__ = [
    "RateDistortionLoss",
    "compute_bpp",
    "make_optimizer",
    "TrainState",
    "make_train_step",
    "make_eval_step",
]
