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


def convert_retinanet_state(sd: Dict[str, np.ndarray], prefix: str = ""):
    """Reference RetinaNet (retinanet/model.py ResNet/studentResNet) ->
    tasks.retinanet.RetinaNet variables {"params", "batch_stats"}.

    Reference layout: torchvision-style backbone (conv1/bn1/layer1-4,
    model.py:160-171) + PyramidFeatures P3_1..P7_2 (19-42) +
    regressionModel/classificationModel (conv1-4 + output, 68-152).
    """
    if prefix:
        sd = {
            k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)
        }
    backbone = convert_torchvision_resnet(sd)
    fpn = {
        name: convert_conv(sd[f"fpn.{name}.weight"], sd[f"fpn.{name}.bias"])
        for name in ("P5_1", "P5_2", "P4_1", "P4_2", "P3_1", "P3_2",
                     "P6", "P7_2")
    }

    def head(ref):
        p = {
            f"conv{i}": convert_conv(
                sd[f"{ref}.conv{i}.weight"], sd[f"{ref}.conv{i}.bias"]
            )
            for i in range(1, 5)
        }
        p["output"] = convert_conv(
            sd[f"{ref}.output.weight"], sd[f"{ref}.output.bias"]
        )
        return p

    params = {
        "backbone": backbone["params"],
        "fpn": fpn,
        "regression": head("regressionModel"),
        "classification": head("classificationModel"),
    }
    stats = {"backbone": backbone["batch_stats"]}
    return {"params": params, "batch_stats": stats}


def convert_detectron2_fpn(sd: Dict[str, np.ndarray], prefix: str = ""):
    """Detectron2 R-FPN backbone state (stem/res2-5/fpn_lateral/
    fpn_output naming — the reference's frozen task net,
    fasterRCNN_ICM.py:41-55) -> models.icm._FrozenFPN variables.

    Detectron2 blocks: ``res{L+1}.{i}.conv{1-3}`` with fused ``.norm``
    (FrozenBatchNorm) -> our ``layer{L}_{i}/Conv_{k}/BatchNorm_{k}``;
    ``shortcut`` -> the block's last Conv/BatchNorm slot.
    """
    if prefix:
        sd = {
            k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)
        }
    params: Dict[str, dict] = {}
    stats: Dict[str, dict] = {}

    def put(dst_p, dst_s, idx, conv_key):
        dst_p[f"Conv_{idx}"] = convert_conv(sd[f"{conv_key}.weight"])
        dst_p[f"BatchNorm_{idx}"] = {
            "scale": np.asarray(sd[f"{conv_key}.norm.weight"]),
            "bias": np.asarray(sd[f"{conv_key}.norm.bias"]),
        }
        dst_s[f"BatchNorm_{idx}"] = {
            "mean": np.asarray(sd[f"{conv_key}.norm.running_mean"]),
            "var": np.asarray(sd[f"{conv_key}.norm.running_var"]),
        }

    # Detectron2's FPN wraps the ResNet as `bottom_up.`; raw ResNet
    # checkpoints have stem/res at the top level — accept both
    bu = "bottom_up." if any(k.startswith("bottom_up.") for k in sd) else ""
    put(params, stats, 0, f"{bu}stem.conv1")
    reps = {2: 3, 3: 4, 4: 6, 5: 3}  # R50
    for res, n in reps.items():
        L = res - 1
        for i in range(n):
            bp, bs = {}, {}
            for k in range(3):
                put(bp, bs, k, f"{bu}res{res}.{i}.conv{k + 1}")
            if f"{bu}res{res}.{i}.shortcut.weight" in sd:
                put(bp, bs, 3, f"{bu}res{res}.{i}.shortcut")
            params[f"layer{L}_{i}"] = bp
            stats[f"layer{L}_{i}"] = bs

    fpn_p = {}
    for lvl in range(2, 6):
        fpn_p[f"lateral{lvl}"] = convert_conv(
            sd[f"fpn_lateral{lvl}.weight"], sd.get(f"fpn_lateral{lvl}.bias")
        )
        fpn_p[f"output{lvl}"] = convert_conv(
            sd[f"fpn_output{lvl}.weight"], sd.get(f"fpn_output{lvl}.bias")
        )
    return {
        "params": {"ResNetBackbone_0": params, "FPN_0": fpn_p},
        "batch_stats": {"ResNetBackbone_0": stats},
    }


def convert_torchvision_resnet(
    sd: Dict[str, np.ndarray],
    block: str = "bottleneck",
    layers=(3, 4, 6, 3),
):
    """torchvision ResNet state dict -> ResNetBackbone variables
    ({"params", "batch_stats"}). Covers the RetinaNet teacher path (the
    reference loads torchvision resnet50 weights into its detector's
    backbone, retinanet/model.py:530-545).

    Mapping: stem conv1/bn1 -> Conv_0/BatchNorm_0; block
    ``layer{L}.{i}.conv{k}/bn{k}`` -> ``layer{L}_{i}/Conv_{k-1}/
    BatchNorm_{k-1}``; ``downsample.0/.1`` -> the block's last
    Conv/BatchNorm slot (Conv_2 for basic, Conv_3 for bottleneck)."""
    n_convs = 2 if block == "basic" else 3
    params: Dict[str, dict] = {}
    stats: Dict[str, dict] = {}

    def put(path, conv_idx, conv_key, bn_key):
        node_p = params.setdefault(path, {})
        node_s = stats.setdefault(path, {})
        node_p[f"Conv_{conv_idx}"] = convert_conv(sd[conv_key + ".weight"])
        bp, bs = convert_batchnorm(bn_key, sd)
        node_p[f"BatchNorm_{conv_idx}"] = bp
        node_s[f"BatchNorm_{conv_idx}"] = bs

    put("", 0, "conv1", "bn1")
    stem_p, stem_s = params.pop(""), stats.pop("")
    params.update(stem_p)
    stats.update(stem_s)

    for L, reps in enumerate(layers, start=1):
        for i in range(reps):
            path = f"layer{L}_{i}"
            for k in range(n_convs):
                put(path, k, f"layer{L}.{i}.conv{k + 1}",
                    f"layer{L}.{i}.bn{k + 1}")
            if f"layer{L}.{i}.downsample.0.weight" in sd:
                put(path, n_convs, f"layer{L}.{i}.downsample.0",
                    f"layer{L}.{i}.downsample.1")
    return {"params": params, "batch_stats": stats}
