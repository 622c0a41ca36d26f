"""Zigzag scan orders over (channel-slice, H-block, W-block) lattices.

The reference implements three near-identical traversal generators that
enumerate diagonal "shells" of a 3-D lattice, inline in the model code as
per-step tensor slicing loops:
  - 3-D constrained (channel bounded by the shell): ``stf6.py:654-762``
    (2x2 spatial blocks), also stf8/9/11/12/14;
  - channel-unconstrained (all slices at every spatial step):
    ``stf13.py:339-440`` = ``fasterRCNN_ICM.py:103-204``;
  - windowed token variant (window_size 8, flattened tokens):
    ``stf2.py:804-912``.

TPU-native design: the traversal runs ONCE in numpy at trace time and
becomes a static permutation; the split/merge are a single reshape/
transpose/gather the compiler folds into layout ops — instead of N
strided-slice ops per forward (reference does 24+ slice/cat per call).

Block semantics match the reference view: the spatial factors are the
COARSE dims (``view(B, nS, C', nH, H', nW, W')``), i.e. blocks are
contiguous image quadrants (for number=2), not interleaved samples; the
channel slice index is likewise the coarse factor of C.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np


def _advance(c, h, w, i, nC, nH, nW, constrained):
    """One step of the reference's index state machine."""
    if (c + 2 > nC) or (constrained and c + 1 > i):
        c = 0
        if h + 2 > nH or h + 1 > i:
            w += 1
            h = 0
        else:
            h += 1
    else:
        c += 1
    return c, h, w


@functools.lru_cache(maxsize=128)
def zigzag_order(
    nC: int, nH: int, nW: int, constrained: bool = True
) -> Tuple[Tuple[int, int, int], ...]:
    """Ordered (c, h, w) lattice positions of the zigzag traversal.

    ``constrained=True`` -> stf6-style (channel index bounded by shell);
    ``constrained=False`` -> stf13-style (all channels every shell).
    """
    order: List[Tuple[int, int, int]] = []
    shells = max(nC, nH, nW) if constrained else max(nH, nW)
    for i in range(shells):
        c = h = w = 0
        n_inner = (
            (min(i + 1, nC) if constrained else nC)
            * min(i + 1, nH)
            * min(i + 1, nW)
        )
        for _ in range(n_inner):
            on_shell = (
                max(c, h, w) >= i if constrained else max(h, w) >= i
            )
            if on_shell or i == 0:
                order.append((c, h, w))
            c, h, w = _advance(c, h, w, i, nC, nH, nW, constrained)
    assert len(order) == nC * nH * nW, (len(order), nC, nH, nW)
    assert len(set(order)) == len(order), "zigzag order is not a permutation"
    return tuple(order)


@functools.lru_cache(maxsize=128)
def _flat_order(nC: int, nH: int, nW: int, constrained: bool) -> np.ndarray:
    order = zigzag_order(nC, nH, nW, constrained)
    return np.array([c * nH * nW + h * nW + w for c, h, w in order], np.int32)


def inverse_order(order) -> np.ndarray:
    order = np.asarray(order)
    inv = np.empty_like(order)
    inv[order] = np.arange(order.shape[0], dtype=order.dtype)
    return inv


def _to_blocks(x, num_slices: int, nH: int, nW: int):
    """(B, H, W, C) -> (B, nS*nH*nW, H', W', C') with coarse-block
    semantics (slice = coarse C factor, block = coarse H/W factor)."""
    B, H, W, C = x.shape
    assert H % nH == 0 and W % nW == 0 and C % num_slices == 0
    Hp, Wp, Cp = H // nH, W // nW, C // num_slices
    x = x.reshape(B, nH, Hp, nW, Wp, num_slices, Cp)
    x = x.transpose(0, 5, 1, 3, 2, 4, 6)  # B, nS, nH, nW, H', W', C'
    return x.reshape(B, num_slices * nH * nW, Hp, Wp, Cp)


def _from_blocks(blocks, num_slices: int, nH: int, nW: int):
    B, N, Hp, Wp, Cp = blocks.shape
    x = blocks.reshape(B, num_slices, nH, nW, Hp, Wp, Cp)
    x = x.transpose(0, 2, 4, 3, 5, 1, 6)  # B, nH, H', nW, W', nS, C'
    return x.reshape(B, nH * Hp, nW * Wp, num_slices * Cp)


def zigzag_split(x, num_slices: int, nH: int = 2, nW: int = 2, constrained=True):
    """(B, H, W, C) -> (B, N, H/nH, W/nW, C/nS) in zigzag order.

    Parity: reference ``ZigzagSplits`` (stf6.py:654-714 / stf13.py:339-391)
    — one gather instead of the per-step slicing loop.
    """
    blocks = _to_blocks(x, num_slices, nH, nW)
    return jnp.take(
        blocks, jnp.asarray(_flat_order(num_slices, nH, nW, constrained)), axis=1
    )


def zigzag_merge(
    zz, num_slices: int, nH: int = 2, nW: int = 2, constrained=True
):
    """Inverse of zigzag_split (reference ``ZigzagReverse``)."""
    inv = inverse_order(_flat_order(num_slices, nH, nW, constrained))
    blocks = jnp.take(zz, jnp.asarray(inv), axis=1)
    return _from_blocks(blocks, num_slices, nH, nW)


def zigzag_split_tokens(
    x, num_slices: int, window_size: int = 8, constrained=True
):
    """Windowed token variant (reference stf2.py:804-866): pads H, W to
    window multiples; returns (B, N, window*window*C/nS) tokens plus the
    (nH, nW) lattice dims."""
    B, H, W, C = x.shape
    ws = window_size
    pad_b = (ws - H % ws) % ws
    pad_r = (ws - W % ws) % ws
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    nH, nW = (H + pad_b) // ws, (W + pad_r) // ws
    zz = zigzag_split(x, num_slices, nH, nW, constrained)
    Bn, N, Hp, Wp, Cp = zz.shape
    return zz.reshape(Bn, N, Hp * Wp * Cp), nH, nW
