"""Model registry.

Mirrors the reference zoo (reference: ``compressai/zoo/__init__.py:23-43``)
— 19 registered names. Entries are filled in as model families land; each
maps name -> (flax module class, default kwargs).
"""

from .base import CompressionModel, CodecTables
from .cnn import WACNN
from .codec import CharmCodec, build_codec_tables
from .stf import SymmetricalTransFormer

models = {
    "cnn": (WACNN, {}),
    "stf": (SymmetricalTransFormer, {}),
}


def create_model(name: str, **overrides):
    cls, kwargs = models[name]
    return cls(**{**kwargs, **overrides})


__all__ = [
    "CompressionModel",
    "CodecTables",
    "WACNN",
    "CharmCodec",
    "build_codec_tables",
    "models",
    "create_model",
]
