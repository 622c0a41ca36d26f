"""The ONE shared Swin-transformer stack.

The reference re-pastes ~360 lines of identical Swin scaffolding into each
of 14 stf files (canonical copy: reference ``stf.py:24-381``; SURVEY.md
§2.1 "Swin scaffolding"). Here it exists once, channel-last, and every
Swin-based codec composes it.

Behavioral parity (all against ``stf.py``):
  - ``Mlp`` — dense/GELU/dense (24-39)
  - ``SwinBlock`` — LN, pad-to-window, cyclic shift, W-MSA with relative
    position bias + static SW-MSA mask, FFN, stochastic depth (124-199)
  - ``PatchMerging`` — 4-neighbor concat, LN(4C), Linear 4C->2C no bias
    (202-235)
  - ``PatchSplit`` — LN(C), Linear C->2C no bias, 2x depth-to-space
    (238-258)
  - ``BasicLayer`` — block stack with alternating shift 0/ws//2 +
    optional down/upsample (260-330)
  - ``PatchEmbed`` — patch_size-strided conv + optional LN (333-381)

TPU-native notes:
  - features stay (B, H, W, C) throughout (no (B, L, C) token flattening;
    the reference's reshapes exist for torch LayerNorm ergonomics — XLA
    sees pure layout ops either way, but NHWC keeps every conv/attention
    in its natural layout).
  - SW-MSA masks and relative-position indexes are numpy constants
    computed at trace time (H, W static under jit) — zero runtime cost.
  - window attention is a batched (B*nW, tokens, C) matmul stack that XLA
    maps onto the MXU; a fused Pallas kernel can swap in underneath
    ``WindowAttention`` without touching this file.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import (
    WindowAttention,
    activation_dtype,
    shifted_window_mask,
    window_partition,
    window_reverse,
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


class Mlp(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = _trunc_dense(self.hidden, dtype=activation_dtype())(x)
        x = jax.nn.gelu(x, approximate=False)
        return _trunc_dense(self.out, dtype=activation_dtype())(x)


class DropPath(nn.Module):
    """Stochastic depth on the residual branch (reference uses timm
    DropPath with rates linspace(0, 0.2))."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, mask_shape)
        return jnp.where(mask, x / keep, 0.0)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, H, W, C = x.shape
        ws = self.window_size
        ss = self.shift_size
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5)(x)

        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r

        if ss > 0:
            x = jnp.roll(x, shift=(-ss, -ss), axis=(1, 2))
            mask = shifted_window_mask(Hp, Wp, ws, ss)
        else:
            mask = None

        from .pallas_kernels import class_masks, window_class_map

        n_cls, cls_per_window = window_class_map(Hp, Wp, ws, ss)
        mask_cls = (n_cls, cls_per_window, class_masks(Hp, Wp, ws, ss))

        xw = window_partition(x, ws).reshape(-1, ws * ws, C)
        attn = WindowAttention(
            dim=C, window_size=(ws, ws), num_heads=self.num_heads, name="attn"
        )(xw, mask=mask, mask_cls=mask_cls)
        x = window_reverse(attn.reshape(-1, ws, ws, C), ws, Hp, Wp)

        if ss > 0:
            x = jnp.roll(x, shift=(ss, ss), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :H, :W, :]

        dp = DropPath(self.drop_path)
        x = shortcut + dp(x, deterministic)
        y = Mlp(int(C * self.mlp_ratio), C, name="mlp")(
            nn.LayerNorm(epsilon=1e-5)(x)
        )
        return x + dp(y, deterministic)


class PatchMerging(nn.Module):
    """2x downsample: 4-neighbor concat -> LN -> Linear 4C->2C (no bias)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5)(x)
        return _trunc_dense(2 * C, use_bias=False, dtype=activation_dtype())(x)


class PatchSplit(nn.Module):
    """2x upsample: LN -> Linear C->2C (no bias) -> depth-to-space."""

    dim: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = nn.LayerNorm(epsilon=1e-5)(x)
        x = _trunc_dense(2 * C, use_bias=False, dtype=activation_dtype())(x)
        # depth-to-space r=2 (PixelShuffle semantics)
        x = x.reshape(B, H, W, C // 2, 2, 2)
        x = x.transpose(0, 1, 4, 2, 5, 3)
        return x.reshape(B, 2 * H, 2 * W, C // 2)


class BasicLayer(nn.Module):
    dim: int
    depth: int
    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path: Sequence[float] | float = 0.0
    downsample: Optional[str] = None  # None | "merge" | "split"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.depth):
            dp = (
                self.drop_path[i]
                if isinstance(self.drop_path, (list, tuple))
                else self.drop_path
            )
            x = SwinBlock(
                dim=self.dim,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio,
                drop_path=dp,
                name=f"block{i}",
            )(x, deterministic)
        if self.downsample == "merge":
            x = PatchMerging(self.dim, name="downsample")(x)
        elif self.downsample == "split":
            x = PatchSplit(self.dim, name="downsample")(x)
        return x


class PatchEmbed(nn.Module):
    patch_size: int = 4
    embed_dim: int = 96
    use_norm: bool = True

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        p = self.patch_size
        if H % p or W % p:
            x = jnp.pad(
                x, ((0, 0), (0, (p - H % p) % p), (0, (p - W % p) % p), (0, 0))
            )
        x = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), padding="VALID",
            dtype=activation_dtype(),
        )(x)
        if self.use_norm:
            x = nn.LayerNorm(epsilon=1e-5)(x)
        return x


class CrossWindowAttention(nn.Module):
    """W-MSA with q from x and k/v from a context map (reference
    ``WindowAttention_context``, czigzag.py:123-197): separate q and kv
    projections, same relative position bias as self-attention."""

    dim: int
    window_size: tuple
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, context, mask=None):
        from .layers import relative_position_index

        B_, N, C = x.shape
        nh = self.num_heads
        hd = C // nh
        q = _trunc_dense(
            C, use_bias=self.qkv_bias, name="q", dtype=activation_dtype()
        )(x)
        kv = _trunc_dense(
            2 * C, use_bias=self.qkv_bias, name="kv", dtype=activation_dtype()
        )(context)
        q = q.reshape(B_, N, nh, hd).transpose(0, 2, 1, 3)
        kv = kv.reshape(B_, N, 2, nh, hd).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]

        attn = jnp.einsum("bhnd,bhmd->bhnm", q * hd ** -0.5, k)
        wh, ww = self.window_size
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * wh - 1) * (2 * ww - 1), nh),
        )
        idx = relative_position_index(wh, ww).reshape(-1)
        bias = table[idx].reshape(N, N, nh).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, nh, N, N) + jnp.asarray(
                mask, attn.dtype
            )[None, :, None]
            attn = attn.reshape(B_, nh, N, N)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
            v.dtype
        )
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        return _trunc_dense(C, name="proj", dtype=activation_dtype())(out)


class SwinBlockCross(nn.Module):
    """Swin block with cross-window-attention conditioning (reference
    czigzag.py:200-288): x and context are shifted/partitioned together;
    q comes from x, k/v from context."""

    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, context, deterministic: bool = True):
        from .layers import window_partition, window_reverse, shifted_window_mask

        B, H, W, C = x.shape
        ws, ss = self.window_size, self.shift_size
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5)(x)
        # the reference normalizes only x; context enters kv RAW
        # (czigzag.py:232-240: norm1(x), context merely reshaped)
        context = context.astype(x.dtype)

        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        if pad_b or pad_r:
            pads = ((0, 0), (0, pad_b), (0, pad_r), (0, 0))
            x = jnp.pad(x, pads)
            context = jnp.pad(context, pads)
        Hp, Wp = H + pad_b, W + pad_r

        if ss > 0:
            x = jnp.roll(x, shift=(-ss, -ss), axis=(1, 2))
            context = jnp.roll(context, shift=(-ss, -ss), axis=(1, 2))
            mask = shifted_window_mask(Hp, Wp, ws, ss)
        else:
            mask = None

        xw = window_partition(x, ws).reshape(-1, ws * ws, C)
        cw = window_partition(context, ws).reshape(-1, ws * ws, C)
        attn = CrossWindowAttention(
            dim=C, window_size=(ws, ws), num_heads=self.num_heads, name="attn"
        )(xw, cw, mask=mask)
        x = window_reverse(attn.reshape(-1, ws, ws, C), ws, Hp, Wp)

        if ss > 0:
            x = jnp.roll(x, shift=(ss, ss), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :H, :W, :]

        dp = DropPath(self.drop_path)
        x = shortcut + dp(x, deterministic)
        y = Mlp(int(C * self.mlp_ratio), C, name="mlp")(
            nn.LayerNorm(epsilon=1e-5)(x)
        )
        return x + dp(y, deterministic)


class BasicLayerCross(nn.Module):
    """Stack of cross-conditioned Swin blocks + optional down/upsample of
    x (context stays at the input resolution for all blocks in the stack,
    as in the reference czigzag BasicLayer)."""

    dim: int
    depth: int
    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path: Sequence[float] | float = 0.0
    downsample: Optional[str] = None

    @nn.compact
    def __call__(self, x, context, deterministic: bool = True):
        for i in range(self.depth):
            dp = (
                self.drop_path[i]
                if isinstance(self.drop_path, (list, tuple))
                else self.drop_path
            )
            x = SwinBlockCross(
                dim=self.dim,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio,
                drop_path=dp,
                name=f"block{i}",
            )(x, context, deterministic)
        if self.downsample == "merge":
            x = PatchMerging(self.dim, name="downsample")(x)
        elif self.downsample == "split":
            x = PatchSplit(self.dim, name="downsample")(x)
        return x
