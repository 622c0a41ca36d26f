"""Checkpoint converter structure tests: converted trees must exactly
match the flax models' init trees (names + shapes)."""

import jax
import jax.numpy as jnp
import numpy as np

from icm_tpu.models import SymmetricalTransFormer, WACNN
from icm_tpu.zoo import convert_stf_checkpoint, convert_wacnn_checkpoint


def _tree_specs(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_tree_specs(v, path))
        else:
            out[path] = tuple(np.shape(v))
    return out


def _conv_w(o, i, k):
    return np.zeros((o, i, k, k), np.float32)


def _make_fake_stf_sd(embed=8, depths=(1, 1), heads=(1, 2), ws=4,
                      slices=2, hyper=(64, 56, 48, 40, 32),
                      hyper_dec=(40, 48, 56, 64, 64), cc=(24, 20, 16, 12)):
    """Reference stf torch state dict with the tiny config's shapes
    (module names transcribed from reference stf.py:384-556)."""
    sd = {}
    M = embed * 2 ** (len(depths) - 1)

    def ln(name, c):
        sd[f"{name}.weight"] = np.zeros((c,), np.float32)
        sd[f"{name}.bias"] = np.zeros((c,), np.float32)

    def lin(name, o, i, bias=True):
        sd[f"{name}.weight"] = np.zeros((o, i), np.float32)
        if bias:
            sd[f"{name}.bias"] = np.zeros((o,), np.float32)

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = _conv_w(o, i, k)
        sd[f"{name}.bias"] = np.zeros((o,), np.float32)

    conv("patch_embed.proj", embed, 3, 2)
    ln("patch_embed.norm", embed)

    def blocks(prefix, dim, depth, nh):
        for j in range(depth):
            b = f"{prefix}.blocks.{j}"
            ln(f"{b}.norm1", dim)
            lin(f"{b}.attn.qkv", 3 * dim, dim)
            lin(f"{b}.attn.proj", dim, dim)
            sd[f"{b}.attn.relative_position_bias_table"] = np.zeros(
                ((2 * ws - 1) ** 2, nh), np.float32
            )
            ln(f"{b}.norm2", dim)
            lin(f"{b}.mlp.fc1", 4 * dim, dim)
            lin(f"{b}.mlp.fc2", dim, 4 * dim)

    n = len(depths)
    for i in range(n):
        dim = embed * 2 ** i
        blocks(f"layers.{i}", dim, depths[i], heads[i])
        if i < n - 1:
            sd[f"layers.{i}.downsample.reduction.weight"] = np.zeros(
                (2 * dim, 4 * dim), np.float32
            )
            ln(f"layers.{i}.downsample.norm", 4 * dim)
    rdepths = tuple(reversed(depths))
    rheads = tuple(reversed(heads))
    for i in range(n):
        dim = embed * 2 ** (n - 1 - i)
        blocks(f"syn_layers.{i}", dim, rdepths[i], rheads[i])
        if i < n - 1:
            sd[f"syn_layers.{i}.downsample.reduction.weight"] = np.zeros(
                (2 * dim, dim), np.float32
            )
            ln(f"syn_layers.{i}.downsample.norm", dim)

    conv("end_conv.0", embed * 4, embed, 5)
    conv("end_conv.2", 3, embed, 3)

    widths = [M] + list(hyper)
    for i in range(5):
        conv(f"h_a.{2 * i}", hyper[i], widths[i], 3)
    for tag in ("h_mean_s", "h_scale_s"):
        conv(f"{tag}.0", hyper_dec[0], hyper[-1], 3)
        conv(f"{tag}.2.0", hyper_dec[1] * 4, hyper_dec[0], 3)
        conv(f"{tag}.4", hyper_dec[2], hyper_dec[1], 3)
        conv(f"{tag}.6.0", hyper_dec[3] * 4, hyper_dec[2], 3)
        conv(f"{tag}.8", hyper_dec[4], hyper_dec[3], 3)

    sc = M // slices
    for i in range(slices):
        for tag, extra in (
            ("cc_mean_transforms", 0),
            ("cc_scale_transforms", 0),
            ("lrp_transforms", sc),
        ):
            support = sc * min(i + (1 if extra else 0),
                               slices // 2 + (1 if extra else 0))
            cin = [hyper_dec[-1] + support] + list(cc)
            for j in range(4):
                conv(f"{tag}.{i}.{2 * j}", cc[j], cin[j], 3)
            conv(f"{tag}.{i}.8", sc, cc[-1], 3)

    C = hyper[-1]
    sd["entropy_bottleneck.quantiles"] = np.zeros((C, 1, 3), np.float32)
    fdims = (1, 3, 3, 3, 3, 1)
    for i in range(5):
        sd[f"entropy_bottleneck._matrix{i}"] = np.zeros(
            (C, fdims[i + 1], fdims[i]), np.float32
        )
        sd[f"entropy_bottleneck._bias{i}"] = np.zeros(
            (C, fdims[i + 1], 1), np.float32
        )
        if i < 4:
            sd[f"entropy_bottleneck._factor{i}"] = np.zeros(
                (C, fdims[i + 1], 1), np.float32
            )
    return sd


def test_stf_converter_tree_matches_init():
    cfg = dict(
        embed_dim=8, depths=(1, 1), num_heads=(1, 2), window_size=4,
        patch_size=2, num_slices=2, drop_path_rate=0.0,
        hyper_enc_widths=(64, 56, 48, 40, 32),
        hyper_dec_widths=(40, 48, 56, 64, 64),
        cc_widths=(24, 20, 16, 12),
    )
    model = SymmetricalTransFormer(**cfg)
    x = jnp.zeros((1, 32, 32, 3))
    v = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        x,
    )
    sd = _make_fake_stf_sd()
    converted = convert_stf_checkpoint(sd, depths=(1, 1), num_slices=2)
    want = _tree_specs(v["params"])
    got = _tree_specs(converted)
    assert got == want, (
        sorted(set(want) - set(got))[:5],
        sorted(set(got) - set(want))[:5],
        [k for k in want if k in got and want[k] != got[k]][:5],
    )
