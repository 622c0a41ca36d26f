"""Conv helpers and window-attention blocks, channel-last (NHWC).

Behavioral parity:
- ``conv``/``deconv`` — reference ``compressai/models/utils.py:114-132``
  (5x5 stride-2 with pad k//2; transpose conv with output_padding=1).
- ``conv3x3``/``conv1x1``/``subpel_conv3x3`` — reference
  ``compressai/layers/layers.py:29-43``.
- ``WindowAttention`` / ``WinBasedAttention`` / ``Win_noShift_Attention`` —
  reference ``compressai/layers/win_attention.py:37-207`` and
  ``layers/layers.py:45-89``.

TPU-native notes:
- everything is NHWC; window partition is a reshape/transpose (free for
  XLA); attention over W*W tokens (16 or 64) is a small batched matmul
  that XLA tiles straight onto the MXU.
- shifted-window masks are computed with numpy at trace time (H, W are
  static under jit) and baked into the graph as constants.
- upsampling prefers sub-pixel conv (conv + depth_to_space): a dense
  conv is MXU-friendly whereas transpose convs lower to scatter-like ops.
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def conv(features: int, kernel_size: int = 5, stride: int = 2) -> nn.Conv:
    pad = kernel_size // 2
    return nn.Conv(
        features,
        (kernel_size, kernel_size),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dtype=activation_dtype(),
    )


def conv3x3(features: int, stride: int = 1) -> nn.Conv:
    return conv(features, kernel_size=3, stride=stride)


def conv1x1(features: int, stride: int = 1) -> nn.Conv:
    return nn.Conv(
        features, (1, 1), strides=(stride, stride), dtype=activation_dtype()
    )


def deconv(features: int, kernel_size: int = 5, stride: int = 2) -> nn.ConvTranspose:
    """Learned upsampling, out = in * stride — the exact geometry of the
    reference's ``deconv`` (ConvTranspose2d k, s, padding=k//2,
    output_padding=s-1; reference models/utils.py:124-132): explicit
    padding (k-1-p, k-1-p+op) keeps the tap alignment identical to torch,
    so converted checkpoints are numerically exact
    (see utils/torch_weights.convert_conv_transpose)."""
    k, s = kernel_size, stride
    p = k // 2
    lo, hi = k - 1 - p, k - 1 - p + (s - 1)
    return nn.ConvTranspose(
        features,
        (k, k),
        strides=(s, s),
        padding=((lo, hi), (lo, hi)),
        dtype=activation_dtype(),
    )


def _trunc_dense(*args, **kwargs):
    """Dense with the reference's Swin init (trunc_normal std=0.02 on
    every Linear weight, zero bias — reference stf.py _init_weights).
    Flax's lecun_normal default is ~2.5x larger at these widths; the
    smaller identity-like start measurably stabilizes from-scratch
    training of the deep residual stacks (round-5 finding: lecun-init
    stf collapsed its latent within one epoch at lmbda=0.0067)."""
    kwargs.setdefault(
        "kernel_init", nn.initializers.truncated_normal(0.02)
    )
    return nn.Dense(*args, **kwargs)


class SubpelConv(nn.Module):
    """3x3 conv + depth-to-space upsample (reference subpel_conv3x3,
    ``layers/layers.py:33-38``). Preferred upsampler on TPU."""

    features: int
    r: int = 1
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        pad = self.kernel_size // 2
        x = nn.Conv(
            self.features * self.r ** 2,
            (self.kernel_size, self.kernel_size),
            padding=((pad, pad), (pad, pad)),
            dtype=activation_dtype(),
        )(x)
        if self.r == 1:
            return x
        B, H, W, C = x.shape
        r = self.r
        # depth_to_space (CRD order, matches PixelShuffle semantics)
        x = x.reshape(B, H, W, C // (r * r), r, r)
        x = x.transpose(0, 1, 4, 2, 5, 3)
        return x.reshape(B, H * r, W * r, C // (r * r))


def subpel_conv3x3(features: int, r: int = 1) -> SubpelConv:
    return SubpelConv(features=features, r=r)


def window_partition(x, window_size: int):
    """(B, H, W, C) -> (B * nH * nW, ws, ws, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // window_size, window_size, W // window_size, window_size, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size, window_size, C)


def window_reverse(windows, window_size: int, H: int, W: int):
    """(B * nH * nW, ws, ws, C) -> (B, H, W, C)."""
    nH, nW = H // window_size, W // window_size
    B = windows.shape[0] // (nH * nW)
    x = windows.reshape(B, nH, nW, window_size, window_size, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


@functools.lru_cache(maxsize=64)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """Static (wh*ww, wh*ww) index into the (2wh-1)(2ww-1) bias table."""
    coords = np.stack(
        np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # 2, N, N
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)


@functools.lru_cache(maxsize=64)
def shifted_window_mask(H: int, W: int, window_size: int, shift_size: int) -> np.ndarray:
    """Static SW-MSA mask (nW, N, N) with 0 / -100 entries (reference
    ``win_attention.py:159-177``). Computed in numpy at trace time."""
    img_mask = np.zeros((H, W), np.int32)
    slices = (
        slice(0, -window_size),
        slice(-window_size, -shift_size),
        slice(-shift_size, None),
    )
    cnt = 0
    for h in slices:
        for w in slices:
            img_mask[h, w] = cnt
            cnt += 1
    nH, nW = H // window_size, W // window_size
    mw = img_mask.reshape(nH, window_size, nW, window_size)
    mw = mw.transpose(0, 2, 1, 3).reshape(-1, window_size * window_size)
    attn_mask = mw[:, None, :] - mw[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


_ACT_DTYPE = None  # None = full f32 (flax default promotion)


def set_activation_dtype(value):
    """Mixed-precision policy for the transform stacks: pass
    ``jnp.bfloat16`` to run conv/dense/attention activations in bf16
    (params stay f32 masters; flax casts both to the compute dtype per
    layer). Entropy math (EB/GC likelihoods) and LayerNorm/softmax stay
    f32 regardless — the coder path never uses this policy, so
    bitstreams are unaffected. ``None`` restores full f32.

    Must be set BEFORE tracing (module construction is pure; the dtype
    is read at trace time), like :func:`set_use_pallas`."""
    global _ACT_DTYPE
    _ACT_DTYPE = value


def activation_dtype():
    return _ACT_DTYPE


_USE_PALLAS: Optional[bool] = None


def set_use_pallas(value: Optional[bool]):
    """Force the fused Pallas window-attention kernel on/off; None = auto
    (on when running on TPU)."""
    global _USE_PALLAS
    _USE_PALLAS = value


def _pallas_enabled() -> bool:
    if _USE_PALLAS is not None:
        return _USE_PALLAS
    import jax as _jax

    return _jax.default_backend() == "tpu"


class WindowAttention(nn.Module):
    """W-MSA over flattened windows with relative position bias.

    Input: (num_windows*B, N, C); mask: (nW, N, N) or None.
    ``mask_cls=(n_cls, cls_per_window, class_mask_array)`` enables the
    fused Pallas kernel path (see pallas_kernels.py): the SW-MSA mask is
    folded per window-class into the bias so the whole attention runs in
    VMEM.
    """

    dim: int
    window_size: tuple  # (wh, ww)
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None

    @nn.compact
    def __call__(self, x, mask=None, mask_cls=None):
        B_, N, C = x.shape
        nh = self.num_heads
        head_dim = C // nh
        scale = self.qk_scale or head_dim ** -0.5

        qkv = _trunc_dense(
            C * 3, use_bias=self.qkv_bias, name="qkv",
            dtype=activation_dtype(),
        )(x)

        wh, ww = self.window_size
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * wh - 1) * (2 * ww - 1), nh),
        )
        idx = relative_position_index(wh, ww).reshape(-1)
        bias = table[idx].reshape(N, N, nh).transpose(2, 0, 1)  # (nh, N, N)

        from .pallas_kernels import fused_attention_profitable

        if (
            mask_cls is not None
            and _pallas_enabled()
            and self.qk_scale is None
            and fused_attention_profitable(B_)
        ):
            from .pallas_kernels import window_attention_fused

            n_cls, cls_per_window, cls_masks = mask_cls
            nW = cls_per_window.shape[0]
            B = B_ // nW
            qkv = qkv.reshape(B_, N, 3, nh, head_dim).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]  # (B_, nh, N, D)
            bias_cls = bias[None] + jnp.asarray(cls_masks, bias.dtype)[
                :, None
            ]  # (n_cls, nh, N, N)
            cls_idx = jnp.tile(jnp.asarray(cls_per_window, jnp.int32), (B,))
            out = window_attention_fused(q, k, v, bias_cls, cls_idx)
            out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
            return _trunc_dense(C, name="proj", dtype=activation_dtype())(out)

        qkv = qkv.reshape(B_, N, 3, nh, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, nh, N, N) + jnp.asarray(
                mask, attn.dtype
            )[None, :, None]
            attn = attn.reshape(B_, nh, N, N)
        attn = jax.nn.softmax(
            attn.astype(jnp.promote_types(attn.dtype, jnp.float32)), axis=-1
        ).astype(v.dtype)

        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        return _trunc_dense(C, name="proj", dtype=activation_dtype())(out)


class WinBasedAttention(nn.Module):
    """Residual (shifted-)window attention block on an NHWC feature map
    (reference ``WinBasedAttention``, ``win_attention.py:118-207``; no MLP)."""

    dim: int
    num_heads: int = 8
    window_size: int = 8
    shift_size: int = 0

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        ws, ss = self.window_size, self.shift_size
        assert 0 <= ss < ws
        assert H % ws == 0 and W % ws == 0, (H, W, ws)
        shortcut = x

        mask = shifted_window_mask(H, W, ws, ss) if ss > 0 else None
        if ss > 0:
            x = jnp.roll(x, shift=(-ss, -ss), axis=(1, 2))

        from .pallas_kernels import class_masks, window_class_map

        n_cls, cls_per_window = window_class_map(H, W, ws, ss)
        mask_cls = (n_cls, cls_per_window, class_masks(H, W, ws, ss))

        xw = window_partition(x, ws).reshape(-1, ws * ws, C)
        attn = WindowAttention(
            dim=C, window_size=(ws, ws), num_heads=self.num_heads, name="attn"
        )(xw, mask=mask, mask_cls=mask_cls)
        x = window_reverse(attn.reshape(-1, ws, ws, C), ws, H, W)

        if ss > 0:
            x = jnp.roll(x, shift=(ss, ss), axis=(1, 2))
        return shortcut + x


class ResidualUnit(nn.Module):
    """1x1 -> GELU -> 3x3 -> GELU -> 1x1 bottleneck with residual + GELU
    (reference ``layers/layers.py:52-71``)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        N = self.dim
        out = conv1x1(N // 2)(x)
        out = jax.nn.gelu(out, approximate=False)
        out = conv3x3(N // 2)(out)
        out = jax.nn.gelu(out, approximate=False)
        out = conv1x1(N)(out)
        return jax.nn.gelu(out + x, approximate=False)


class Win_noShift_Attention(nn.Module):
    """Gated window-attention residual block (reference
    ``layers/layers.py:45-89``): trunk of 3 residual units times the
    sigmoid of an attention branch, plus identity."""

    dim: int
    num_heads: int = 8
    window_size: int = 8
    shift_size: int = 0

    @nn.compact
    def __call__(self, x):
        N = self.dim
        a = x
        for i in range(3):
            a = ResidualUnit(N, name=f"trunk{i}")(a)
        b = WinBasedAttention(
            dim=N,
            num_heads=self.num_heads,
            window_size=self.window_size,
            shift_size=self.shift_size,
            name="win_attn",
        )(x)
        for i in range(3):
            b = ResidualUnit(N, name=f"branch{i}")(b)
        b = conv1x1(N, stride=1)(b)
        return x + a * jax.nn.sigmoid(b)
