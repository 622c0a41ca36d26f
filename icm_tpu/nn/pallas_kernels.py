"""Pallas TPU kernels for the hot ops.

Fused window attention: the codecs' dominant non-conv compute is W-MSA
over thousands of small windows (16 or 64 tokens). The jnp path
materializes the (windows, heads, N, N) attention tensor in HBM twice
(write after QK^T, read for the PV matmul). This kernel computes
softmax(QK^T * scale + bias_cls) V for a tile of windows entirely in
VMEM — one HBM read of q/k/v, one HBM write of the output.

Masking: the SW-MSA mask of a shifted window depends only on the window's
position class (interior / right edge / bottom edge / corner = up to 9
distinct patterns for 2-D shifts). The caller folds relative-position
bias + mask into a per-class additive tensor ``bias (n_cls, heads, N, N)``
and passes an int32 class id per window (prefetched to SMEM), so the
kernel gathers one small VMEM block instead of streaming per-window masks
from HBM.

Falls back to the jnp implementation off-TPU (interpret mode covers
tests; `window_attention_fused(..., interpret=True)`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(cls_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    # q/k/v: (T, H, N, D); bias: (n_cls, H, N, N); cls_ref: SMEM (T, 1)
    T = q_ref.shape[0]

    def body(t, _):
        q = q_ref[t]  # (H, N, D)
        k = k_ref[t]
        v = v_ref[t]
        attn = jax.lax.dot_general(
            q * scale, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (H, N, N)
        c = cls_ref[t, 0]
        attn = attn + bias_ref[c]
        attn = jax.nn.softmax(attn, axis=-1)
        o_ref[t] = jax.lax.dot_general(
            attn.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, T, body, 0)


def window_attention_fused(
    q, k, v, bias, cls_idx, *, tile: int = 8, interpret: bool = False
):
    """Differentiable wrapper: forward runs the fused Pallas kernel,
    backward differentiates the numerically-equal XLA reference
    implementation (Pallas TPU kernels don't support reverse-mode
    autodiff, which the training path needs)."""
    return _fused_vjp(q, k, v, bias, cls_idx, tile, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_vjp(q, k, v, bias, cls_idx, tile, interpret):
    return _window_attention_fused_impl(
        q, k, v, bias, cls_idx, tile=tile, interpret=interpret
    )


def _fused_fwd(q, k, v, bias, cls_idx, tile, interpret):
    out = _window_attention_fused_impl(
        q, k, v, bias, cls_idx, tile=tile, interpret=interpret
    )
    return out, (q, k, v, bias, cls_idx)


def _fused_bwd(tile, interpret, res, g):
    q, k, v, bias, cls_idx = res
    ref = lambda q_, k_, v_, b_: window_attention_reference(  # noqa: E731
        q_, k_, v_, b_, cls_idx
    )
    _, vjp = jax.vjp(ref, q, k, v, bias)
    # under a bf16 activation policy the kernel's output (and thus the
    # incoming cotangent) is bf16, while the reference path promotes to
    # f32 through the bias add — align the cotangent dtype with the
    # reference output before pulling it back
    out_aval = jax.eval_shape(ref, q, k, v, bias)
    dq, dk, dv, dbias = vjp(g.astype(out_aval.dtype))
    dcls = np.zeros(cls_idx.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dbias, dcls


_fused_vjp.defvjp(_fused_fwd, _fused_bwd)


def _window_attention_fused_impl(
    q, k, v, bias, cls_idx, *, tile: int = 8, interpret: bool = False
):
    """q, k, v: (W, H, N, D); bias: (n_cls, H, N, N) (relative-position
    bias with the SW-MSA mask already folded in); cls_idx: (W,) int32
    class per window. Returns (W, H, N, D).

    The class ids stream per-tile into SMEM as a (T, 1) block. Calls with
    many windows are chunked (<= ``chunk`` windows per pallas_call) via
    ``lax.map`` — the axon remote TPU compiler fails on this kernel past
    ~W=512, and the chunked body compiles once regardless of W.

    Measured on v5e: the fused kernel wins below ~256 windows (dispatch/
    fusion bound); above that XLA's batched GEMMs win — callers should
    prefer the jnp path for large W (see ``fused_attention_profitable``)."""
    W, H, N, D = q.shape
    chunk = 256
    if W > chunk and not interpret:
        pad = (chunk - W % chunk) % chunk
        if pad:
            qp = jnp.pad(q, ((0, pad), (0, 0), (0, 0), (0, 0)))
            kp = jnp.pad(k, ((0, pad), (0, 0), (0, 0), (0, 0)))
            vp = jnp.pad(v, ((0, pad), (0, 0), (0, 0), (0, 0)))
            cp = jnp.pad(cls_idx, ((0, pad),))
        else:
            qp, kp, vp, cp = q, k, v, cls_idx
        n = qp.shape[0] // chunk
        qc = qp.reshape(n, chunk, H, N, D)
        kc = kp.reshape(n, chunk, H, N, D)
        vc = vp.reshape(n, chunk, H, N, D)
        cc = cp.reshape(n, chunk)
        out = jax.lax.map(
            lambda args: _window_attention_fused_impl(
                args[0], args[1], args[2], bias, args[3], tile=tile
            ),
            (qc, kc, vc, cc),
        )
        return out.reshape(n * chunk, H, N, D)[:W]

    scale = D ** -0.5
    T = min(tile, W)
    if W % T:
        # Mosaic requires the SMEM block's leading dim to either divide
        # evenly or equal the array dim (a reduced partial tile like
        # (5, 1) over (100, 1) is rejected) — pad the window axis up to
        # a tile multiple and slice the padded windows back off.
        pad = T - W % T
        return _window_attention_fused_impl(
            jnp.pad(q, ((0, pad), (0, 0), (0, 0), (0, 0))),
            jnp.pad(k, ((0, pad), (0, 0), (0, 0), (0, 0))),
            jnp.pad(v, ((0, pad), (0, 0), (0, 0), (0, 0))),
            bias,
            jnp.pad(cls_idx, ((0, pad),)),
            tile=tile,
            interpret=interpret,
        )[:W]

    cls2d = cls_idx.reshape(W, 1)
    grid_spec = pl.GridSpec(
        grid=(W // T,),
        in_specs=[
            pl.BlockSpec((T, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((T, H, N, D), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((T, H, N, D), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((T, H, N, D), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec(bias.shape, lambda i: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((T, H, N, D), lambda i: (i, 0, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((W, H, N, D), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(cls2d, q, k, v, bias)


def window_attention_reference(q, k, v, bias, cls_idx):
    """jnp reference with identical semantics (used off-TPU and in tests)."""
    scale = q.shape[-1] ** -0.5
    attn = jnp.einsum("whnd,whmd->whnm", q * scale, k)
    attn = attn + bias[cls_idx]
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("whnm,whmd->whnd", attn, v)


@functools.lru_cache(maxsize=64)
def window_class_map(H: int, W: int, window_size: int, shift_size: int):
    """(n_cls, class-per-window) for the shifted-window mask structure:
    class = (row-class, col-class) where the last window row/col (which
    wraps after the cyclic shift) differs from the interior."""
    nH, nW = H // window_size, W // window_size
    if shift_size == 0:
        return 1, np.zeros(nH * nW, np.int32)
    row_cls = np.zeros(nH, np.int32)
    row_cls[-1] = 1
    col_cls = np.zeros(nW, np.int32)
    col_cls[-1] = 1
    cls = row_cls[:, None] * 2 + col_cls[None, :]
    return 4, cls.reshape(-1).astype(np.int32)


@functools.lru_cache(maxsize=64)
def class_masks(H: int, W: int, window_size: int, shift_size: int):
    """(n_cls, N, N) additive masks per window class (matches
    layers.shifted_window_mask per-window rows, deduplicated by class)."""
    from .layers import shifted_window_mask

    n_cls, cls = window_class_map(H, W, window_size, shift_size)
    N = window_size * window_size
    if shift_size == 0:
        return np.zeros((1, N, N), np.float32)
    full = shifted_window_mask(H, W, window_size, shift_size)  # (nW, N, N)
    out = np.zeros((n_cls, N, N), np.float32)
    for c in range(n_cls):
        idx = np.nonzero(cls == c)[0]
        if len(idx):
            out[c] = full[idx[0]]
    return out


def fused_attention_profitable(num_windows: int) -> bool:
    """v5e measurement: fused wins for <=256 windows; XLA's batched GEMMs
    win beyond (the kernel's per-window serial dots underutilize the MXU
    at scale)."""
    return num_windows <= 256
