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


def _refiner_stacks(sd, ref_tag, flax_tag, n_slices, depths):
    """Per-slice Swin refiner stacks: reference ``{ref_tag}.{i}.{j}`` is
    the j-th BasicLayer of slice i (reference stf5.py:484-570) ->
    flax ``{flax_tag}_{i}/stage{j}``."""
    out = {}
    for i in range(n_slices):
        stages = {}
        for j, d in enumerate(depths):
            stages[f"stage{j}"] = _basic_layer(
                sd, f"{ref_tag}.{i}.{j}", d, has_downsample=False
            )
        out[f"{flax_tag}_{i}"] = stages
    return out


def convert_zigzag_checkpoint(
    state_dict: Dict[str, np.ndarray],
    *,
    depths=(2, 2, 6, 2),
    ctx_slices: int,
    cc_suffix: str = "",
    refiners: Dict[str, tuple] = None,
    refiner_suffix: str = "",
    num_cc_convs: int = 5,
) -> dict:
    """Reference stf5-8 torch state dict -> flax params for
    models.ZigzagSwinCodec.

    Shared Swin transforms/hyper follow the stf mapping (stf5-8 re-paste
    stf.py:384-556 verbatim); the deltas are the per-slice context heads
    (``cc_*_transforms2`` for the zigzag variants stf6/stf8) and the
    per-slice Swin refiners (``mu_Swin``/``sigma_Swin``/``LRP_Swin``, or
    ``*_Swin2`` for stf8). ``refiners`` maps flax tag ->
    reference-depth tuple for the ENABLED refiners (stf6 builds
    sigma/LRP refiners but never uses them in forward, stf6.py:824-849 —
    those reference tensors are intentionally dropped).
    """
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
    params["h_mean_s"] = _hyper_dec(sd, "h_mean_s")
    params["h_scale_s"] = _hyper_dec(sd, "h_scale_s")

    for i in range(ctx_slices):
        for tag, ours in (
            (f"cc_mean_transforms{cc_suffix}", "cc_mean"),
            (f"cc_scale_transforms{cc_suffix}", "cc_scale"),
            (f"lrp_transforms{cc_suffix}", "lrp"),
        ):
            params[f"{ours}_{i}"] = {
                f"Conv_{j}": _conv(sd, f"{tag}.{i}.{2 * j}")
                for j in range(num_cc_convs)
            }

    ref_tags = {
        "mu_refine": f"mu_Swin{refiner_suffix}",
        "sigma_refine": f"sigma_Swin{refiner_suffix}",
        "lrp_refine": f"LRP_Swin{refiner_suffix}",
    }
    for flax_tag, rdepths_ in (refiners or {}).items():
        params.update(
            _refiner_stacks(
                sd, ref_tags[flax_tag], flax_tag, ctx_slices, rdepths_
            )
        )

    params["entropy_bottleneck"] = _entropy_bottleneck(sd, "entropy_bottleneck")
    return params


ZIGZAG_CONVERT_CONFIGS = {
    # reference stf5.py:484-570: 12 slices, full refiners (2,6,2,2)
    "stf5": dict(
        ctx_slices=12,
        refiners={
            "mu_refine": (2, 6, 2, 2),
            "sigma_refine": (2, 6, 2, 2),
            "lrp_refine": (2, 6, 2, 2),
        },
    ),
    # reference stf6.py:580-618 (cc_*_transforms2), mu refiner only used
    "stf6": dict(
        ctx_slices=24, cc_suffix="2",
        refiners={"mu_refine": (2, 6, 2, 2)},
    ),
    # reference stf7.py:485-515: light refiners, 12 slices
    "stf7": dict(
        ctx_slices=12,
        refiners={
            "mu_refine": (2, 6),
            "sigma_refine": (2, 2),
            "lrp_refine": (2, 6),
        },
    ),
    # reference stf8.py:487-533: *_Swin2 tags, 24 zigzag slices
    "stf8": dict(
        ctx_slices=24, cc_suffix="2", refiner_suffix="2",
        refiners={
            "mu_refine": (2, 6),
            "sigma_refine": (2, 2),
            "lrp_refine": (2, 6),
        },
    ),
}
ZIGZAG_CONVERT_CONFIGS["stf6_2"] = ZIGZAG_CONVERT_CONFIGS["stf6"]


def _swin_block_cross(sd, prefix):
    """Cross-attention Swin block (reference WindowAttention_context,
    czigzag.py:123-197: separate q/kv projections)."""
    return {
        "LayerNorm_0": _layernorm(sd, f"{prefix}.norm1"),
        "attn": {
            "q": _linear(sd, f"{prefix}.attn.q"),
            "kv": _linear(sd, f"{prefix}.attn.kv"),
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


def _basic_layer_cross(sd, prefix, depth, has_downsample):
    p = {
        f"block{j}": _swin_block_cross(sd, f"{prefix}.blocks.{j}")
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


def convert_czigzag_checkpoint(
    state_dict: Dict[str, np.ndarray],
    depths=(2, 2, 6, 2),
    hyper_depths=(2, 6),
    ctx_slices: int = 16,
) -> dict:
    """Reference conditionalZigzag torch state dict -> flax params for
    models.conditionalZigzag.

    Maps only the modules the reference forward actually uses
    (czigzag.py:951-1180). Dead reference modules are dropped:
    ``patch_embed_up`` (forward embeds up_x4 with the shared
    ``patch_embed``, czigzag.py:954), ``decoder_context`` (forward
    applies ``hyper_conv`` to the decoder context, czigzag.py:985-986 —
    our separate ``decoder_context_{i}`` params therefore receive the
    ``hyper_context.{i}`` weights), the 4th context convs (loop runs
    n-1 stages), the never-called refiners ``mu_Swin2``/``sigma_Swin2``/
    ``LRP_Swin2`` (czigzag.py:1117-1141 commented out) and the conv
    hyper ``h_a``/``h_mean_s``/``h_scale_s`` (czigzag.py:1050-1051
    commented; used only by the stale compress/decompress paths).
    """
    sd = load_pretrained(state_dict)
    n = len(depths)
    params: dict = {}

    params["patch_embed"] = {
        "Conv_0": _conv(sd, "patch_embed.proj"),
        "LayerNorm_0": _layernorm(sd, "patch_embed.norm"),
    }
    for i in range(n):
        params[f"layer{i}"] = _basic_layer_cross(
            sd, f"layers.{i}", depths[i], has_downsample=i < n - 1
        )
    rdepths = tuple(reversed(depths))
    for i in range(n):
        params[f"syn_layer{i}"] = _basic_layer_cross(
            sd, f"syn_layers.{i}", rdepths[i], has_downsample=i < n - 1
        )
    for i in range(n - 1):
        params[f"encoder_context_{i}"] = _conv(sd, f"encoder_context.{i}")
        params[f"hyper_context_{i}"] = _conv(sd, f"hyper_context.{i}")
        params[f"decoder_context_{i}"] = _conv(sd, f"hyper_context.{i}")

    params["hyper_enc0"] = _basic_layer_cross(
        sd, "hyper_encoder_layers.0", hyper_depths[0], False
    )
    params["hyper_enc1"] = _basic_layer_cross(
        sd, "hyper_encoder_layers.1", hyper_depths[1], False
    )
    params["hyper_encoder_conv1"] = _conv(sd, "hyper_encoder_Conv1")
    params["hyper_encoder_conv1_2"] = _conv(sd, "hyper_encoder_Conv1_2")
    params["hyper_encoder_conv2"] = _conv(sd, "hyper_encoder_Conv2")
    for tag, ours in (("mean", "mean"), ("scale", "scale")):
        params[f"hyper_dec_{ours}0"] = _basic_layer_cross(
            sd, f"hyper_decoder_{tag}.0", hyper_depths[0], False
        )
        params[f"hyper_dec_{ours}1"] = _basic_layer_cross(
            sd, f"hyper_decoder_{tag}.1", hyper_depths[1], False
        )
        params[f"hyper_decoder_conv_{ours}1"] = {
            "Conv_0": _conv(sd, f"hyper_decoder_conv_{tag}1.0")
        }
        params[f"hyper_decoder_conv_{ours}2"] = _conv(
            sd, f"hyper_decoder_conv_{tag}2"
        )

    params["end_up"] = {"Conv_0": _conv(sd, "end_conv.0")}
    params["end_to_rgb"] = _conv(sd, "end_conv.2")

    for i in range(ctx_slices):
        for tag, ours in (
            ("cc_mean_transforms2", "cc_mean"),
            ("cc_scale_transforms2", "cc_scale"),
            ("lrp_transforms2", "lrp"),
        ):
            params[f"{ours}_{i}"] = {
                f"Conv_{j}": _conv(sd, f"{tag}.{i}.{2 * j}") for j in range(5)
            }

    params["entropy_bottleneck"] = _entropy_bottleneck(sd, "entropy_bottleneck")
    return params


# --- masked-context family (stf2/3/4) converters ------------------------------


def _stf_transforms_tree(sd, depths=(2, 2, 6, 2)):
    """Shared Swin transform + conv hyper mapping (the scaffolding all
    stf-family files re-paste; canonical stf.py:384-507)."""
    n = len(depths)
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
    rdepths = tuple(reversed(depths))
    g_s = {}
    for i in range(n):
        g_s[f"layer{i}"] = _basic_layer(
            sd, f"syn_layers.{i}", rdepths[i], has_downsample=i < n - 1
        )
    g_s["up"] = {"Conv_0": _conv(sd, "end_conv.0")}
    g_s["to_rgb"] = _conv(sd, "end_conv.2")
    return {
        "g_a": g_a,
        "g_s": g_s,
        "h_a": {f"Conv_{i}": _conv(sd, f"h_a.{2 * i}") for i in range(5)},
        "h_mean_s": _hyper_dec(sd, "h_mean_s"),
        "h_scale_s": _hyper_dec(sd, "h_scale_s"),
        "entropy_bottleneck": _entropy_bottleneck(sd, "entropy_bottleneck"),
    }


def convert_masked_ctx_checkpoint(
    state_dict: Dict[str, np.ndarray], arch: str
) -> dict:
    """Reference stf2/stf3/stf4 state dicts -> flax params for the
    models.masked_ctx family.

    Forward-dead reference groups are dropped: stf2's conv-transform
    ``g_a``/``g_s`` (its forward uses the Swin stack, stf2.py:1016-1157;
    the conv pair feeds only the stale compress path at stf2.py:1189) and
    stf4's never-called ``maskedContextModel_sigma`` (forward computes
    both mu and scale from the mu context, stf4.py:1052-1086).
    """
    sd = load_pretrained(state_dict)
    params = _stf_transforms_tree(sd)

    if arch == "stf2":
        for ref_tag, ours in (
            ("cc_mean_transforms", "cc_mean_head"),
            ("cc_scale_transforms", "cc_scale_head"),
            ("lrp_transforms", "lrp_head"),
        ):
            params[ours] = {
                f"Conv_{j}": _conv(sd, f"{ref_tag}.{2 * j}") for j in range(4)
            }
        params["muContextModel"] = {"qkv": _linear(sd, "muContextModel.qkv")}
        params["sigmaContextModel"] = {
            "qkv": _linear(sd, "sigmaContextModel.qkv")
        }
        return params

    if arch == "stf3":
        for tag in ("maskedContextModel_mu", "maskedContextModel_sigma"):
            ctx = {}
            for i in range(5):  # 5 blocks (stf3.py:565-618)
                ctx[f"attn{i}"] = {"qkv": _linear(sd, f"{tag}.context{i + 1}.qkv")}
                ctx[f"LayerNorm_{i}"] = _layernorm(sd, f"{tag}.norm{i + 1}")
                ctx[f"Dense_{2 * i}"] = _linear(sd, f"{tag}.mlp{i + 1}.fc1")
                ctx[f"Dense_{2 * i + 1}"] = _linear(sd, f"{tag}.mlp{i + 1}.fc2")
            params[tag] = ctx
        params["lrp"] = {
            f"Conv_{j}": _conv(sd, f"lrp_transforms.{2 * j}") for j in range(4)
        }
        return params

    assert arch == "stf4", arch
    params["maskedContextModel_mu"] = {
        "qkv": _linear(sd, "maskedContextModel_mu.0.qkv")
    }
    for ref_tag, ours in (
        ("cc_mean_transforms", "cc_mean_head"),
        ("cc_scale_transforms", "cc_scale_head"),
    ):
        params[ours] = {
            f"Conv_{j}": _conv(sd, f"{ref_tag}.{2 * j}") for j in range(4)
        }
    params["lrp"] = {
        f"Conv_{j}": _conv(sd, f"lrp_transforms.{2 * j}") for j in range(4)
    }
    return params


# --- CRC family (stf9/11/12/13/14) converters --------------------------------
# Reference module layouts transcribed from stf9.py/stf12.py/stf13.py/
# stf14.py setup blocks; dead reference groups are dropped: the pasted Swin
# scaffolding (patch_embed/layers/syn_layers/end_conv), the commented-out
# LRP_Swin2 refiners (stf9.py:1095-1105), the promot_* adapters and the
# frozen RetinaNet teacher/student nets (external pretrained weights, not
# codec state).


def _conv_stack(sd, prefix, n):
    return {f"Conv_{j}": _conv(sd, f"{prefix}.{2 * j}") for j in range(n)}


def _deconv_stack(sd, prefix, n):
    return {
        f"ConvTranspose_{j}": _deconv(sd, f"{prefix}.{2 * j}")
        for j in range(n)
    }


def _main_cnn_encoder(sd, prefix):
    """reference mainCNNencoder layout (baseLayer.py:69-80 = WACNN g_a)."""
    return {
        "Conv_0": _conv(sd, f"{prefix}.0"),
        "GDN_0": _gdn(sd, f"{prefix}.1"),
        "Conv_1": _conv(sd, f"{prefix}.2"),
        "GDN_1": _gdn(sd, f"{prefix}.3"),
        "Win_noShift_Attention_0": _win_noshift(sd, f"{prefix}.4"),
        "Conv_2": _conv(sd, f"{prefix}.5"),
        "GDN_2": _gdn(sd, f"{prefix}.6"),
        "Conv_3": _conv(sd, f"{prefix}.7"),
        "Win_noShift_Attention_1": _win_noshift(sd, f"{prefix}.8"),
    }


def _main_cnn_decoder(sd, prefix):
    """reference mainCNNdecoder (baseLayer.py:115-126)."""
    return {
        "Win_noShift_Attention_0": _win_noshift(sd, f"{prefix}.0"),
        "ConvTranspose_0": _deconv(sd, f"{prefix}.1"),
        "GDN_0": _gdn(sd, f"{prefix}.2"),
        "ConvTranspose_1": _deconv(sd, f"{prefix}.3"),
        "GDN_1": _gdn(sd, f"{prefix}.4"),
        "Win_noShift_Attention_1": _win_noshift(sd, f"{prefix}.5"),
        "ConvTranspose_2": _deconv(sd, f"{prefix}.6"),
        "GDN_2": _gdn(sd, f"{prefix}.7"),
        "ConvTranspose_3": _deconv(sd, f"{prefix}.8"),
    }


def _main_cnn_decoder_part1(sd, prefix):
    return {
        "Win_noShift_Attention_0": _win_noshift(sd, f"{prefix}.0"),
        "ConvTranspose_0": _deconv(sd, f"{prefix}.1"),
        "GDN_0": _gdn(sd, f"{prefix}.2"),
        "ConvTranspose_1": _deconv(sd, f"{prefix}.3"),
        "GDN_1": _gdn(sd, f"{prefix}.4"),
        "Win_noShift_Attention_1": _win_noshift(sd, f"{prefix}.5"),
    }


def _main_cnn_decoder_part2(sd, prefix):
    return {
        "ConvTranspose_0": _deconv(sd, f"{prefix}.0"),
        "GDN_0": _gdn(sd, f"{prefix}.1"),
        "ConvTranspose_1": _deconv(sd, f"{prefix}.2"),
    }


def _context_scale2(sd, prefix):
    """reference mainCNNcontextScale2 (baseLayer.py:154-165)."""
    return {
        "Win_noShift_Attention_0": _win_noshift(sd, f"{prefix}.0"),
        "ConvTranspose_0": _deconv(sd, f"{prefix}.1"),
        "GDN_0": _gdn(sd, f"{prefix}.2"),
        "ConvTranspose_1": _deconv(sd, f"{prefix}.3"),
    }


def _hyper_dec_extra(sd, prefix, extra: int):
    """Hyper decoder + `extra` trailing convs (stf9 human hyper,
    stf9.py:806-848: indices 10, 12, ... after the base stack)."""
    p = _hyper_dec(sd, prefix)
    for j in range(extra):
        p[f"Conv_{3 + j}"] = _conv(sd, f"{prefix}.{10 + 2 * j}")
    return p


def _cc_heads(sd, ref_tag, ours_tag, n_slices, n_convs):
    return {
        f"{ours_tag}_{i}": {
            f"Conv_{j}": _conv(sd, f"{ref_tag}.{i}.{2 * j}")
            for j in range(n_convs)
        }
        for i in range(n_slices)
    }


def _zigzag_coder_tree(sd, *, ref_prefix="", eb_key="entropy_bottleneck",
                       n_slices=24, cc_convs=5, include_lrp=True):
    """The ZigzagCharmCoder param subtree from reference keys
    ``{ref_prefix}h_a`` etc. (inline coder blocks of stf9-14 /
    fasterRCNN_ICM). ``include_lrp=False`` for the stf9/11/12/14 machine
    layers, whose reference forward computes-then-discards the LRP
    (stf9.py:1095-1105 — the 0.5*tanh add is commented out), so our
    apply_lrp=False coder never materializes those params."""
    coder = {
        "h_a": _conv_stack(sd, f"{ref_prefix}h_a", 5),
        "h_mean_s": _hyper_dec(sd, f"{ref_prefix}h_mean_s"),
        "h_scale_s": _hyper_dec(sd, f"{ref_prefix}h_scale_s"),
        "entropy_bottleneck": _entropy_bottleneck(sd, eb_key),
    }
    coder.update(
        _cc_heads(sd, f"{ref_prefix}cc_mean_transforms2", "cc_mean",
                  n_slices, cc_convs)
    )
    coder.update(
        _cc_heads(sd, f"{ref_prefix}cc_scale_transforms2", "cc_scale",
                  n_slices, cc_convs)
    )
    if include_lrp:
        coder.update(
            _cc_heads(sd, f"{ref_prefix}lrp_transforms2", "lrp",
                      n_slices, cc_convs)
        )
    return coder


def _human_simple_hyper(sd, extra_convs=5):
    """stf9/12/14 one-shot human hyper (stf9.py:795-848)."""
    return {
        "h_a": _conv_stack(sd, "human_h_a", 5),
        "h_mean_s": _hyper_dec_extra(sd, "human_h_mean_s", extra_convs),
        "h_scale_s": _hyper_dec_extra(sd, "human_h_scale_s", extra_convs),
        "entropy_bottleneck": _entropy_bottleneck(sd, "entropy_bottleneck_human"),
    }


def convert_crc_checkpoint(state_dict: Dict[str, np.ndarray], arch: str) -> dict:
    """Reference stf9/stf11/stf12/stf13/stf14 state dict -> flax params
    for the models.crc family."""
    sd = load_pretrained(state_dict)
    params: dict = {}

    cc_convs = 3 if arch == "stf13" else 5  # stf13 uses baseLayer 3-conv
    params["machine"] = {
        "g_a": _main_cnn_encoder(sd, "g_a"),
        "coder": _zigzag_coder_tree(
            sd, n_slices=24, cc_convs=cc_convs,
            include_lrp=arch == "stf13",
        ),
    }

    if arch in ("stf9", "stf11", "stf14"):
        params["g_s1"] = _main_cnn_decoder_part1(sd, "g_s1")
        params["g_s2"] = _main_cnn_decoder_part2(sd, "g_s2")
        params["human_g_s2"] = _main_cnn_decoder(sd, "human_g_s2")
        params["human_g_a"] = _conv_stack(sd, "human_g_a", 4)
        params["human_g_s"] = _deconv_stack(sd, "human_g_s", 4)
        params["human_hyper"] = _human_simple_hyper(sd)
        if arch != "stf14":  # stf14's context decoder is dead (stf14.py:1153)
            params["human_context_decoder"] = _conv_stack(
                sd, "human_context_decoder", 5
            )
        return params

    if arch == "stf12":
        params["g_s1"] = _main_cnn_decoder_part1(sd, "g_s1")
        params["g_s2"] = _main_cnn_decoder_part2(sd, "g_s2")
        params["human_g_enc2"] = {
            "MainCNNDecoder_0": _main_cnn_decoder(sd, "human_g_enc2")
        }
        params["human_g_enc3"] = _context_scale2(sd, "human_g_enc3")
        params["human_hyper"] = _human_simple_hyper(sd)
        params["human_context_decoder"] = _conv_stack(
            sd, "human_context_decoder", 3
        )
        params["human_g_a1"] = _conv_stack(sd, "human_g_a1", 2)
        params["human_g_a2"] = {
            "Conv_0": _conv(sd, "human_g_a2.0"),
            "Conv_1": _conv(sd, "human_g_a2.2"),
            "Win_noShift_Attention_0": _win_noshift(sd, "human_g_a2.4"),
        }
        params["human_g_s1"] = {
            "Win_noShift_Attention_0": _win_noshift(sd, "human_g_s1.0"),
            "ConvTranspose_0": _deconv(sd, "human_g_s1.2"),
            "ConvTranspose_1": _deconv(sd, "human_g_s1.4"),
        }
        params["human_g_s2"] = {
            "ConvTranspose_0": _deconv(sd, "human_g_s2.0"),
            "Conv_0": _conv(sd, "human_g_s2.2"),
            "ConvTranspose_1": _deconv(sd, "human_g_s2.4"),
        }
        params["human_context_decoder2"] = {
            "Conv_0": _conv(sd, "human_context_decoder2.0"),
            "Conv_1": _conv(sd, "human_context_decoder2.2"),
            "SubpelConv_0": {"Conv_0": _conv(sd, "human_context_decoder2.4.0")},
            "SubpelConv_1": {"Conv_0": _conv(sd, "human_context_decoder2.6.0")},
        }
        return params

    assert arch == "stf13", arch
    params["g_s"] = _main_cnn_decoder(sd, "g_s")  # g_s1/g_s2 dead (stf13.py:539)
    params["seg_g_enc2"] = {
        "MainCNNDecoder_0": _main_cnn_decoder(sd, "seg_g_enc2")
    }
    params["seg_g_enc3"] = _context_scale2(sd, "seg_g_enc3")
    params["seg_coder"] = _zigzag_coder_tree(
        sd, ref_prefix="seg_", eb_key="entropy_bottleneck_seg",
        n_slices=24, cc_convs=3,
    )
    params["seg_g_s"] = _main_cnn_decoder(sd, "seg_g_s")
    for name in ("human_g_enc2", "human_g_enc4"):
        params[name] = {"MainCNNDecoder_0": _main_cnn_decoder(sd, name)}
    for name in ("human_g_enc3", "human_g_enc5"):
        params[name] = _context_scale2(sd, name)
    params["human_hyper"] = {
        "h_a": _conv_stack(sd, "human_h_a", 5),
        # stf13 deconv-style hyper decoders (stf13.py:223-267), stored
        # under the `_2`-suffixed reference names
        "h_mean_s": {
            "Conv_0": _conv(sd, "human_h_mean_s_2.0"),
            "ConvTranspose_0": _deconv(sd, "human_h_mean_s_2.2"),
            "ConvTranspose_1": _deconv(sd, "human_h_mean_s_2.4"),
        },
        "h_scale_s": {
            "Conv_0": _conv(sd, "human_h_scale_s_2.0"),
            "ConvTranspose_0": _deconv(sd, "human_h_scale_s_2.2"),
            "ConvTranspose_1": _deconv(sd, "human_h_scale_s_2.4"),
        },
        "entropy_bottleneck": _entropy_bottleneck(sd, "entropy_bottleneck_human"),
    }
    params["human_context_decoder"] = _conv_stack(sd, "human_context_decoder", 2)
    params["human_context_decoder3"] = _conv_stack(sd, "human_context_decoder3", 2)
    params["seg_g_a1"] = _conv_stack(sd, "seg_g_a1", 2)
    params["seg_g_a2"] = {
        "Conv_0": _conv(sd, "seg_g_a2.0"),
        "Conv_1": _conv(sd, "seg_g_a2.2"),
        "Win_noShift_Attention_0": _win_noshift(sd, "seg_g_a2.4"),
    }
    params["human_g_a1_2"] = _conv_stack(sd, "human_g_a1_2", 2)
    params["human_g_a2_2"] = _conv_stack(sd, "human_g_a2_2", 2)
    for name in ("generate_mask_scale1", "generate_mask_scale2"):
        params[name] = _conv_stack(sd, name, 3)
    for name in ("human_context_decoder2_2", "human_context_decoder4"):
        params[name] = {
            "Conv_0": _conv(sd, f"{name}.0"),
            "ConvTranspose_0": _deconv(sd, f"{name}.2"),
            "ConvTranspose_1": _deconv(sd, f"{name}.4"),
        }
    params["human_g_s1_2"] = _deconv_stack(sd, "human_g_s1_2", 2)
    params["human_g_s2_2"] = {
        "ConvTranspose_0": _deconv(sd, "human_g_s2_2.0"),
        "Conv_0": _conv(sd, "human_g_s2_2.2"),
        "ConvTranspose_1": _deconv(sd, "human_g_s2_2.4"),
    }
    return params


# --- ICM / task-net model converters ------------------------------------------


def convert_cnn2_checkpoint(state_dict: Dict[str, np.ndarray]):
    """Reference WACNN2 ("cnn2", cnn2.py:26-381) -> flax variables.

    Codec keys are the WACNN layout verbatim; the trained RetinaNet
    student converts via ``convert_retinanet_state``. The frozen
    ``teacherNet`` (external pretrained weights, cnn2.py:135-145) is
    dropped — our WACNN2 runs the teacher through the same student net
    under stop_gradient. Returns {"params", "batch_stats"} (the student
    backbone carries BatchNorm statistics).
    """
    from .utils.torch_weights import convert_retinanet_state

    sd = load_pretrained(state_dict)
    params = convert_wacnn_checkpoint(sd)
    student = convert_retinanet_state(sd, prefix="studentNet.")
    params["studentNet"] = student["params"]
    return {
        "params": params,
        "batch_stats": {"studentNet": student["batch_stats"]},
    }


def convert_stf10_checkpoint(state_dict: Dict[str, np.ndarray]) -> dict:
    """Reference SymmetricalTransFormer7 ("stf10", stf10.py:388-1056) ->
    flax params for models.icm.SymmetricalTransFormer7
    (with_task_net=False tree; the DeepLab student loads separately).

    Dropped dead groups: pasted Swin scaffolding, LRP_Swin2 refiners and
    lrp heads (LRP computed but never applied, stf10.py:982-995)."""
    sd = load_pretrained(state_dict)
    params: dict = {
        "g_a": _main_cnn_encoder(sd, "g_a"),
        "coder": _zigzag_coder_tree(
            sd, n_slices=24, cc_convs=5, include_lrp=False
        ),
        "g_s1": _main_cnn_decoder_part1(sd, "g_s1"),
        "g_s2": _main_cnn_decoder_part2(sd, "g_s2"),
        "promot_g_a": {
            **_conv_stack(sd, "promot_g_a", 4),
            "Win_noShift_Attention_0": _win_noshift(sd, "promot_g_a.8"),
        },
        "promot_g_s": {
            "Win_noShift_Attention_0": _win_noshift(sd, "promot_g_s.0"),
            "ConvTranspose_0": _deconv(sd, "promot_g_s.2"),
            "ConvTranspose_1": _deconv(sd, "promot_g_s.4"),
        },
        "promot_h_a": _conv_stack(sd, "promot_h_a", 5),
        "promot_h_mean_s": _hyper_dec(sd, "promot_h_mean_s"),
        "promot_h_scale_s": _hyper_dec(sd, "promot_h_scale_s"),
    }
    return params


def convert_oj_icm_checkpoint(
    state_dict: Dict[str, np.ndarray], arch: str = "oj_ICM"
):
    """Reference FasterRCNN_Coding ("oj_ICM", fasterRCNN_ICM.py:17-326) /
    MaskedRCNN_FasterRCNN_Coding ("seg_oj_ICM", MaskedRCNN_OBJ_ICM.py:
    17-420) -> flax variables.

    Codec: mainCNNencoder/decoder + zigzag coder (num_slices=2 -> 8 ctx
    slices, baseLayer 3-conv context stacks); seg layer adds a seg_
    -prefixed twin with a 6-channel encoder. The frozen Detectron2
    R50-FPN converts via ``convert_detectron2_fpn`` when its keys are
    present in the checkpoint (task_net.*); otherwise codec-only params
    are returned (the reference loads the task net from an external
    pickle anyway, fasterRCNN_ICM.py:46-52)."""
    from .utils.torch_weights import convert_detectron2_fpn

    sd = load_pretrained(state_dict)
    params: dict = {
        "g_a": _main_cnn_encoder(sd, "g_a"),
        "g_s": _main_cnn_decoder(sd, "g_s"),
        "coder": _zigzag_coder_tree(sd, n_slices=8, cc_convs=3),
    }
    if arch == "seg_oj_ICM":
        params["seg_g_a"] = _main_cnn_encoder(sd, "seg_g_a")
        params["seg_g_s"] = _main_cnn_decoder(sd, "seg_g_s")
        params["seg_coder"] = _zigzag_coder_tree(
            sd, ref_prefix="seg_", eb_key="seg_entropy_bottleneck",
            n_slices=8, cc_convs=3,
        )
    if any(k.startswith("task_net.") for k in sd):
        task = convert_detectron2_fpn(sd, prefix="task_net.")
        params["task_net"] = task["params"]
        return {
            "params": params,
            "batch_stats": {"task_net": task["batch_stats"]},
        }
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
    """Load a reference torch checkpoint for any of the 19 zoo names and
    convert it to this framework's parameters.

    Returns a flax params tree, or — for models whose checkpoints carry
    BatchNorm task nets (cnn2, oj_ICM/seg_oj_ICM with stored task_net) —
    a variables dict {"params", "batch_stats"}. Pair with
    ``import_reference_tables`` to also take the checkpoint's stored CDF
    buffers for byte-identical bitstreams."""
    from .utils.torch_weights import load_torch_state_dict

    sd = load_torch_state_dict(path)
    return convert_reference_state_dict(arch, sd)


def convert_reference_state_dict(arch: str, sd: Dict[str, np.ndarray]):
    """Dispatch a reference state dict to the architecture's converter."""
    if arch == "cnn":
        return convert_wacnn_checkpoint(sd)
    if arch == "stf":
        return convert_stf_checkpoint(sd)
    if arch in ZIGZAG_CONVERT_CONFIGS:
        return convert_zigzag_checkpoint(sd, **ZIGZAG_CONVERT_CONFIGS[arch])
    if arch == "czigzag":
        return convert_czigzag_checkpoint(sd)
    if arch in ("stf9", "stf11", "stf12", "stf13", "stf14"):
        return convert_crc_checkpoint(sd, arch)
    if arch in ("stf2", "stf3", "stf4"):
        return convert_masked_ctx_checkpoint(sd, arch)
    if arch == "cnn2":
        return convert_cnn2_checkpoint(sd)
    if arch == "stf10":
        return convert_stf10_checkpoint(sd)
    if arch in ("oj_ICM", "seg_oj_ICM"):
        return convert_oj_icm_checkpoint(sd, arch)
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
