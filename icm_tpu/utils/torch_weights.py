"""Torch/Detectron2 checkpoint -> flax parameter converters.

Migration path for users of the reference: its checkpoints are torch
state dicts (reference ``train.py:515-527``), its task nets load
torchvision-style ResNets and Detectron2 R50-FPN pickles
(``fasterRCNN_ICM.py:41-55``). These utilities convert the tensor layouts:

  - Conv2d weight (O, I, kH, kW)          -> flax Conv kernel (kH, kW, I, O)
  - ConvTranspose2d weight (I, O, kH, kW) -> flax ConvTranspose kernel
                                             (kH, kW, I, O) with spatial flip
  - Linear weight (O, I)                  -> flax Dense kernel (I, O)
  - BatchNorm2d                           -> flax BatchNorm
    {scale, bias, mean, var}

``load_torch_state_dict`` reads a .pt/.pth via torch (CPU) or a
Detectron2 .pkl via pickle, returning {name: np.ndarray}. Name-mapping
tables for whole models live with the models that need them; the
primitives here are tested for numerical equivalence against torch.
"""

from __future__ import annotations

import pickle
from typing import Dict

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            ckpt = pickle.load(f)
        model = ckpt.get("model", ckpt)
        return {k: np.asarray(v) for k, v in model.items()}
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        if hasattr(v, "numpy"):
            out[k.removeprefix("module.")] = v.detach().numpy()
    return out


def convert_conv(weight: np.ndarray, bias=None) -> dict:
    """torch Conv2d (O, I, kH, kW) -> {'kernel': (kH, kW, I, O)[, 'bias']}."""
    p = {"kernel": np.transpose(weight, (2, 3, 1, 0))}
    if bias is not None:
        p["bias"] = np.asarray(bias)
    return p


def convert_conv_transpose(weight: np.ndarray, bias=None) -> dict:
    """torch ConvTranspose2d (I, O, kH, kW) -> flax ConvTranspose kernel
    (kH, kW, I, O). torch's transpose conv correlates with the kernel
    flipped relative to flax's, so flip the spatial dims."""
    k = np.transpose(weight, (2, 3, 0, 1))[::-1, ::-1]
    p = {"kernel": np.ascontiguousarray(k)}
    if bias is not None:
        p["bias"] = np.asarray(bias)
    return p


def convert_linear(weight: np.ndarray, bias=None) -> dict:
    p = {"kernel": np.transpose(weight, (1, 0))}
    if bias is not None:
        p["bias"] = np.asarray(bias)
    return p


def convert_batchnorm(prefix: str, sd: Dict[str, np.ndarray]):
    """Returns (params, batch_stats) dicts for flax BatchNorm."""
    params = {
        "scale": sd[f"{prefix}.weight"],
        "bias": sd[f"{prefix}.bias"],
    }
    stats = {
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }
    return params, stats


def convert_gdn(beta_reparam: np.ndarray, gamma_reparam: np.ndarray) -> dict:
    """Reference GDN stores beta (C,) and gamma (C, C) already in the
    reparametrized domain (layers/gdn.py:53-60) — same convention here."""
    return {"beta": np.asarray(beta_reparam), "gamma": np.asarray(gamma_reparam)}


def strip_backbone_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Detectron2 pickles prefix everything with 'backbone.'
    (reference fasterRCNN_ICM.py:49-51)."""
    return {
        k.split(".", 1)[1]: v for k, v in sd.items() if "backbone" in k.split(".")[0]
    }
