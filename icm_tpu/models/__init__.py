"""Model registry.

Mirrors the reference zoo (reference: ``compressai/zoo/__init__.py:23-43``)
— 19 registered names. Entries are filled in as model families land; each
maps name -> (flax module class, default kwargs).
"""

from .base import CompressionModel, CodecTables
from .cnn import WACNN

models = {
    "cnn": (WACNN, {}),
}


def create_model(name: str, **overrides):
    cls, kwargs = models[name]
    return cls(**{**kwargs, **overrides})


__all__ = ["CompressionModel", "CodecTables", "WACNN", "models", "create_model"]
