"""Typed configuration system.

The reference scatters hyperparameters across per-script argparse defaults
and hard-coded personal paths (SURVEY.md §5.6). Here: one dataclass per
concern, JSON round-trip, per-model presets from the registry.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Optional, Tuple


@dataclasses.dataclass
class ModelConfig:
    name: str = "cnn"
    overrides: Dict[str, Any] = dataclasses.field(default_factory=dict)

    def create(self):
        from .models import create_model

        return create_model(self.name, **self.overrides)


@dataclasses.dataclass
class OptimConfig:
    learning_rate: float = 1e-4
    aux_learning_rate: float = 1e-3
    clip_max_norm: float = 1.0
    lr_patience: int = 10
    freeze_patterns: Tuple[str, ...] = ()
    train_patterns: Optional[Tuple[str, ...]] = None


@dataclasses.dataclass
class DataConfig:
    root: str = ""
    train_split: str = "train"
    test_split: str = "test"
    batch_size: int = 8
    test_batch_size: int = 8
    patch_size: Tuple[int, int] = (256, 256)
    steps_per_epoch: Optional[int] = None


@dataclasses.dataclass
class TrainConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    lmbda: float = 1e-2
    epochs: int = 50
    seed: int = 0
    save: str = "ckpt/best"
    checkpoint: Optional[str] = None

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "TrainConfig":
        raw = json.loads(text)

        def build(dc, d):
            fields = {f.name: f for f in dataclasses.fields(dc)}
            kwargs = {}
            for k, v in d.items():
                f = fields[k]
                if dataclasses.is_dataclass(f.type) or f.name in (
                    "model", "optim", "data",
                ):
                    sub = {"model": ModelConfig, "optim": OptimConfig,
                           "data": DataConfig}[f.name]
                    kwargs[k] = build(sub, v)
                elif isinstance(v, list):
                    kwargs[k] = tuple(v)
                else:
                    kwargs[k] = v
            return dc(**kwargs)

        return build(cls, raw)

    @classmethod
    def from_file(cls, path: str) -> "TrainConfig":
        with open(path) as f:
            return cls.from_json(f.read())


def model_preset(name: str) -> Dict[str, Any]:
    """Default constructor kwargs for a registry name."""
    from .models import models

    cls, kwargs = models[name]
    return dict(kwargs)
