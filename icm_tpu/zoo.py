"""Zoo: model registry re-export + reference checkpoint migration.

Parity with the reference zoo (reference ``compressai/zoo/__init__.py:
23-43`` name->class dict; ``zoo/pretrained.py:19-50`` ``load_pretrained``
strips the DataParallel ``module.`` prefix, drops ``h_s.*`` and renames
legacy EntropyBottleneck keys).

``convert_wacnn_checkpoint`` maps a reference WACNN torch state dict
(NCHW tensors, reference ``cnn.py`` module names) into this framework's
flax parameter tree (NHWC): conv kernels transposed OIHW->HWIO, transpose
convs flipped (exact tap alignment — see nn/layers.deconv), GDN gamma
transposed to (in, out), attention linears transposed, EntropyBottleneck
tensors copied (identical conventions).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

from .models import models, create_model
from .utils.torch_weights import (
    convert_conv,
    convert_conv_transpose,
    convert_linear,
)


def load_pretrained(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Reference key cleanup (zoo/pretrained.py:19-50): strip 'module.',
    drop 'h_s.*', rename legacy EB ParameterList keys
    ('_matrices.{i}' -> '_matrix{i}', etc.)."""
    out = {}
    for k, v in state_dict.items():
        k = k.removeprefix("module.")
        if k.startswith("h_s."):
            continue
        k = re.sub(r"_matrices\.(\d+)", r"_matrix\1", k)
        k = re.sub(r"_biases\.(\d+)", r"_bias\1", k)
        k = re.sub(r"_factors\.(\d+)", r"_factor\1", k)
        out[k] = v
    return out


def _conv(sd, name):
    return convert_conv(sd[f"{name}.weight"], sd.get(f"{name}.bias"))


def _deconv(sd, name):
    return convert_conv_transpose(sd[f"{name}.weight"], sd.get(f"{name}.bias"))


def _linear(sd, name):
    return convert_linear(sd[f"{name}.weight"], sd.get(f"{name}.bias"))


def _gdn(sd, name):
    return {
        "beta": np.asarray(sd[f"{name}.beta"]),
        # torch GDN applies gamma as conv weight (out, in); ours is (in, out)
        "gamma": np.asarray(sd[f"{name}.gamma"]).T,
    }


def _residual_unit(sd, prefix):
    return {
        "Conv_0": _conv(sd, f"{prefix}.conv.0"),
        "Conv_1": _conv(sd, f"{prefix}.conv.2"),
        "Conv_2": _conv(sd, f"{prefix}.conv.4"),
    }


def _win_noshift(sd, prefix):
    p = {}
    for i in range(3):
        p[f"trunk{i}"] = _residual_unit(sd, f"{prefix}.conv_a.{i}")
        p[f"branch{i}"] = _residual_unit(sd, f"{prefix}.conv_b.{i + 1}")
    attn = f"{prefix}.conv_b.0.attn"
    p["win_attn"] = {
        "attn": {
            "qkv": _linear(sd, f"{attn}.qkv"),
            "proj": _linear(sd, f"{attn}.proj"),
            "relative_position_bias_table": np.asarray(
                sd[f"{attn}.relative_position_bias_table"]
            ),
        }
    }
    p["Conv_0"] = _conv(sd, f"{prefix}.conv_b.4")
    return p


def _hyper_dec(sd, prefix):
    return {
        "Conv_0": _conv(sd, f"{prefix}.0"),
        "SubpelConv_0": {"Conv_0": _conv(sd, f"{prefix}.2.0")},
        "Conv_1": _conv(sd, f"{prefix}.4"),
        "SubpelConv_1": {"Conv_0": _conv(sd, f"{prefix}.6.0")},
        "Conv_2": _conv(sd, f"{prefix}.8"),
    }


def _entropy_bottleneck(sd, prefix, n_filters=4):
    p = {"quantiles": np.asarray(sd[f"{prefix}.quantiles"])}
    for i in range(n_filters + 1):
        p[f"matrix{i}"] = np.asarray(sd[f"{prefix}._matrix{i}"])
        p[f"bias{i}"] = np.asarray(sd[f"{prefix}._bias{i}"])
        if i < n_filters:
            p[f"factor{i}"] = np.asarray(sd[f"{prefix}._factor{i}"])
    return p


def convert_wacnn_checkpoint(
    state_dict: Dict[str, np.ndarray], num_slices: int = 10
) -> dict:
    """Reference WACNN torch state dict -> flax params for models.WACNN."""
    sd = load_pretrained(state_dict)
    params = {}

    # g_a: conv,GDN,conv,GDN,Win,conv,GDN,conv,Win (reference cnn.py:31-41)
    params["g_a"] = {
        "Conv_0": _conv(sd, "g_a.0"),
        "GDN_0": _gdn(sd, "g_a.1"),
        "Conv_1": _conv(sd, "g_a.2"),
        "GDN_1": _gdn(sd, "g_a.3"),
        "Win_noShift_Attention_0": _win_noshift(sd, "g_a.4"),
        "Conv_2": _conv(sd, "g_a.5"),
        "GDN_2": _gdn(sd, "g_a.6"),
        "Conv_3": _conv(sd, "g_a.7"),
        "Win_noShift_Attention_1": _win_noshift(sd, "g_a.8"),
    }
    # g_s: Win,deconv,GDN,deconv,GDN,Win,deconv,GDN,deconv (cnn.py:42-52)
    params["g_s"] = {
        "Win_noShift_Attention_0": _win_noshift(sd, "g_s.0"),
        "ConvTranspose_0": _deconv(sd, "g_s.1"),
        "GDN_0": _gdn(sd, "g_s.2"),
        "ConvTranspose_1": _deconv(sd, "g_s.3"),
        "GDN_1": _gdn(sd, "g_s.4"),
        "Win_noShift_Attention_1": _win_noshift(sd, "g_s.5"),
        "ConvTranspose_2": _deconv(sd, "g_s.6"),
        "GDN_2": _gdn(sd, "g_s.7"),
        "ConvTranspose_3": _deconv(sd, "g_s.8"),
    }
    params["h_a"] = {
        f"Conv_{i}": _conv(sd, f"h_a.{2 * i}") for i in range(5)
    }
    params["h_mean_s"] = _hyper_dec(sd, "h_mean_s")
    params["h_scale_s"] = _hyper_dec(sd, "h_scale_s")

    for i in range(num_slices):
        for tag, ours in (
            ("cc_mean_transforms", "cc_mean"),
            ("cc_scale_transforms", "cc_scale"),
            ("lrp_transforms", "lrp"),
        ):
            params[f"{ours}_{i}"] = {
                f"Conv_{j}": _conv(sd, f"{tag}.{i}.{2 * j}") for j in range(5)
            }

    params["entropy_bottleneck"] = _entropy_bottleneck(sd, "entropy_bottleneck")
    return params


def import_reference_tables(
    state_dict: Dict[str, np.ndarray],
) -> "CodecTables | None":
    """Build coder tables directly from the CDF buffers a reference
    checkpoint stores (``_quantized_cdf``/``_offset``/``_cdf_length``
    registered buffers, reference ``entropy_models.py:97-100``, filled by
    ``model.update()``).

    Using the stored buffers instead of rebuilding makes our bitstreams
    BYTE-identical to the reference coder's (rebuilt EB tables can differ
    by ±1 CDF step from torch-vs-JAX float rounding of the learned
    density). Returns None when the checkpoint has no/empty buffers
    (training checkpoints before ``update()``).
    """
    from .entropy import EntropyTables, get_scale_table
    from .models.base import CodecTables

    sd = load_pretrained(state_dict)

    def tables_for(prefix):
        q = sd.get(f"{prefix}._quantized_cdf")
        if q is None or np.asarray(q).size == 0:
            return None
        return EntropyTables(
            quantized_cdf=np.asarray(q, np.int32),
            cdf_length=np.asarray(sd[f"{prefix}._cdf_length"], np.int32),
            offset=np.asarray(sd[f"{prefix}._offset"], np.int32),
        )

    bottlenecks = {}
    gaussian = None
    scale_table = None
    for key in sd:
        if not key.endswith("._quantized_cdf"):
            continue
        prefix = key[: -len("._quantized_cdf")]
        t = tables_for(prefix)
        if t is None:
            continue
        if "gaussian" in prefix.rsplit(".", 1)[-1]:
            gaussian = t
            st = sd.get(f"{prefix}.scale_table")
            scale_table = (
                np.asarray(st, np.float32)
                if st is not None and np.asarray(st).size
                else get_scale_table()
            )
        else:
            bottlenecks[prefix] = t
    if gaussian is None and not bottlenecks:
        return None
    return CodecTables(
        gaussian=gaussian, scale_table=scale_table, bottlenecks=bottlenecks
    )


def load_reference_checkpoint(arch: str, path: str):
    """Load a reference torch checkpoint and convert. Currently implemented
    for 'cnn' (WACNN); other architectures raise NotImplementedError."""
    from .utils.torch_weights import load_torch_state_dict

    sd = load_torch_state_dict(path)
    if arch == "cnn":
        return convert_wacnn_checkpoint(sd)
    if arch == "stf":
        return convert_stf_checkpoint(sd)
    raise NotImplementedError(
        f"reference checkpoint conversion for {arch!r} not implemented yet"
    )


__all__ = [
    "models",
    "create_model",
    "load_pretrained",
    "convert_wacnn_checkpoint",
    "convert_stf_checkpoint",
    "load_reference_checkpoint",
]


def _layernorm(sd, name):
    return {
        "scale": np.asarray(sd[f"{name}.weight"]),
        "bias": np.asarray(sd[f"{name}.bias"]),
    }


def _swin_block(sd, prefix):
    return {
        "LayerNorm_0": _layernorm(sd, f"{prefix}.norm1"),
        "attn": {
            "qkv": _linear(sd, f"{prefix}.attn.qkv"),
            "proj": _linear(sd, f"{prefix}.attn.proj"),
            "relative_position_bias_table": np.asarray(
                sd[f"{prefix}.attn.relative_position_bias_table"]
            ),
        },
        "LayerNorm_1": _layernorm(sd, f"{prefix}.norm2"),
        "mlp": {
            "Dense_0": _linear(sd, f"{prefix}.mlp.fc1"),
            "Dense_1": _linear(sd, f"{prefix}.mlp.fc2"),
        },
    }


def _basic_layer(sd, prefix, depth, has_downsample):
    p = {
        f"block{j}": _swin_block(sd, f"{prefix}.blocks.{j}")
        for j in range(depth)
    }
    if has_downsample:
        p["downsample"] = {
            "LayerNorm_0": _layernorm(sd, f"{prefix}.downsample.norm"),
            "Dense_0": {
                "kernel": np.asarray(
                    sd[f"{prefix}.downsample.reduction.weight"]
                ).T
            },
        }
    return p


def _hyper_dec_stf(sd, prefix):
    return _hyper_dec(sd, prefix)


def convert_stf_checkpoint(
    state_dict: Dict[str, np.ndarray],
    depths=(2, 2, 6, 2),
    num_slices: int = 12,
) -> dict:
    """Reference SymmetricalTransFormer torch state dict -> flax params
    for models.SymmetricalTransFormer (reference stf.py:384-670 module
    names; Swin scaffolding canonical copy stf.py:24-381)."""
    sd = load_pretrained(state_dict)
    n = len(depths)
    params: dict = {}

    g_a = {
        "embed": {
            "Conv_0": _conv(sd, "patch_embed.proj"),
            "LayerNorm_0": _layernorm(sd, "patch_embed.norm"),
        }
    }
    for i in range(n):
        g_a[f"layer{i}"] = _basic_layer(
            sd, f"layers.{i}", depths[i], has_downsample=i < n - 1
        )
    params["g_a"] = g_a

    rdepths = tuple(reversed(depths))
    g_s = {}
    for i in range(n):
        g_s[f"layer{i}"] = _basic_layer(
            sd, f"syn_layers.{i}", rdepths[i], has_downsample=i < n - 1
        )
    g_s["up"] = {"Conv_0": _conv(sd, "end_conv.0")}
    g_s["to_rgb"] = _conv(sd, "end_conv.2")
    params["g_s"] = g_s

    params["h_a"] = {f"Conv_{i}": _conv(sd, f"h_a.{2 * i}") for i in range(5)}
    params["h_mean_s"] = _hyper_dec_stf(sd, "h_mean_s")
    params["h_scale_s"] = _hyper_dec_stf(sd, "h_scale_s")

    for i in range(num_slices):
        for tag, ours in (
            ("cc_mean_transforms", "cc_mean"),
            ("cc_scale_transforms", "cc_scale"),
            ("lrp_transforms", "lrp"),
        ):
            params[f"{ours}_{i}"] = {
                f"Conv_{j}": _conv(sd, f"{tag}.{i}.{2 * j}") for j in range(5)
            }

    params["entropy_bottleneck"] = _entropy_bottleneck(sd, "entropy_bottleneck")
    return params
