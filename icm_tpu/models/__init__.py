"""Model registry.

Mirrors the reference zoo (reference: ``compressai/zoo/__init__.py:23-43``)
— 19 registered names. Entries are filled in as model families land; each
maps name -> (flax module class, default kwargs).
"""

from .base import CompressionModel, CodecTables
from .cnn import WACNN
from .codec import CharmCodec, build_codec_tables
from .crc_codec import CRCCodec, SegOjCodec
from .stf import SymmetricalTransFormer
from .stf_family import (
    STF5_CONFIG,
    STF6_CONFIG,
    STF7_CONFIG,
    STF8_CONFIG,
    ZigzagSwinCodec,
)
from .crc import (
    ConditionalResidualCoding,
    ConditionalResidualCoding2,
    ConditionalResidualCoding3,
    ResidualCoding,
)
from .icm import (
    FasterRCNN_Coding,
    MaskedRCNN_FasterRCNN_Coding,
    SymmetricalTransFormer7,
    WACNN2,
)
from .masked_ctx import ClipEncoder, ClipEncoder3, ClipEncoder4
from .masked_codec import Stf3Codec, Stf4Codec
from .czigzag import conditionalZigzag
from .zigzag_coder import ZigzagCharmCoder

models = {
    "cnn": (WACNN, {}),
    "stf": (SymmetricalTransFormer, {}),
    "stf2": (ClipEncoder, {}),
    "stf3": (ClipEncoder3, {}),
    "stf4": (ClipEncoder4, {}),
    "czigzag": (conditionalZigzag, {}),
    "stf5": (ZigzagSwinCodec, STF5_CONFIG),
    "stf6": (ZigzagSwinCodec, STF6_CONFIG),
    "stf6_2": (ZigzagSwinCodec, STF6_CONFIG),  # reference stf6_2 == stf6
    "stf7": (ZigzagSwinCodec, STF7_CONFIG),
    "stf8": (ZigzagSwinCodec, STF8_CONFIG),
    "stf9": (ConditionalResidualCoding, {}),
    "stf10": (SymmetricalTransFormer7, {}),
    "stf11": (ConditionalResidualCoding, {}),  # reference stf11 == stf9
    "stf12": (ConditionalResidualCoding2, {}),
    "stf13": (ConditionalResidualCoding3, {}),
    "stf14": (ResidualCoding, {}),
    "cnn2": (WACNN2, {}),
    "oj_ICM": (FasterRCNN_Coding, {}),
    "seg_oj_ICM": (MaskedRCNN_FasterRCNN_Coding, {}),
}


def create_model(name: str, **overrides):
    cls, kwargs = models[name]
    return cls(**{**kwargs, **overrides})


__all__ = [
    "CompressionModel",
    "CodecTables",
    "WACNN",
    "CharmCodec",
    "CRCCodec",
    "SegOjCodec",
    "build_codec_tables",
    "models",
    "create_model",
]
