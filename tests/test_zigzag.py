import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icm_tpu.scan import (
    inverse_order,
    zigzag_merge,
    zigzag_order,
    zigzag_split,
    zigzag_split_tokens,
)


def test_golden_constrained_222():
    """Hand-traced against the reference state machine (stf6.py:654-714)."""
    assert zigzag_order(2, 2, 2, True) == (
        (0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0),
        (0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 1, 1),
    )


def test_golden_constrained_322():
    assert zigzag_order(3, 2, 2, True) == (
        (0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0),
        (0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 1, 1),
        (2, 0, 0), (2, 1, 0), (2, 0, 1), (2, 1, 1),
    )


def test_golden_unconstrained_322():
    """Channel-unconstrained variant (stf13.py:339-391): all slices at
    each spatial step."""
    assert zigzag_order(3, 2, 2, False) == (
        (0, 0, 0), (1, 0, 0), (2, 0, 0),
        (0, 1, 0), (1, 1, 0), (2, 1, 0),
        (0, 0, 1), (1, 0, 1), (2, 0, 1),
        (0, 1, 1), (1, 1, 1), (2, 1, 1),
    )


@pytest.mark.parametrize("nC,nH,nW,constrained", [
    (6, 2, 2, True),
    (2, 2, 2, True),
    (8, 2, 2, False),
    (12, 4, 4, True),
    (4, 8, 8, True),
])
def test_order_is_permutation(nC, nH, nW, constrained):
    order = zigzag_order(nC, nH, nW, constrained)
    assert len(order) == nC * nH * nW
    assert len(set(order)) == len(order)
    flat = np.array([c * nH * nW + h * nW + w for c, h, w in order])
    inv = inverse_order(flat)
    np.testing.assert_array_equal(flat[inv], np.arange(len(order)))


def test_split_merge_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 12))
    zz = zigzag_split(x, num_slices=6, nH=2, nW=2)
    assert zz.shape == (2, 24, 4, 4, 2)
    back = zigzag_merge(zz, num_slices=6, nH=2, nW=2)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_split_coarse_block_semantics():
    """Blocks are contiguous quadrants and slices are coarse channel
    groups (reference view semantics, stf6.py:667-669)."""
    H = W = 4
    x = np.zeros((1, H, W, 4), np.float32)
    x[0, :2, :2, 0] = 1.0  # top-left quadrant, channel 0 (slice 0)
    zz = np.asarray(zigzag_split(jnp.asarray(x), num_slices=2, nH=2, nW=2))
    order = zigzag_order(2, 2, 2, True)
    pos = order.index((0, 0, 0))
    np.testing.assert_array_equal(zz[0, pos, :, :, 0], np.ones((2, 2)))
    assert zz[0, pos].sum() == 4.0
    others = [i for i in range(len(order)) if i != pos]
    assert np.asarray([zz[0, i].sum() for i in others]).sum() == 0


def test_token_variant_pads_and_flattens():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 12, 20, 8))
    tokens, nH, nW = zigzag_split_tokens(x, num_slices=4, window_size=8)
    assert (nH, nW) == (2, 3)
    assert tokens.shape == (1, 4 * 2 * 3, 8 * 8 * 2)
