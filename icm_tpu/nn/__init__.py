from .gdn import GDN, GDN1
from .layers import (
    set_use_pallas,
    conv,
    deconv,
    conv1x1,
    conv3x3,
    subpel_conv3x3,
    SubpelConv,
    ResidualUnit,
    WindowAttention,
    WinBasedAttention,
    Win_noShift_Attention,
    window_partition,
    window_reverse,
)

__all__ = [
    "GDN",
    "GDN1",
    "set_use_pallas",
    "conv",
    "deconv",
    "conv1x1",
    "conv3x3",
    "subpel_conv3x3",
    "SubpelConv",
    "ResidualUnit",
    "WindowAttention",
    "WinBasedAttention",
    "Win_noShift_Attention",
    "window_partition",
    "window_reverse",
]
