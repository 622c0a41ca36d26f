import jax
import jax.numpy as jnp
import numpy as np

from icm_tpu.nn import (
    GDN,
    SubpelConv,
    WinBasedAttention,
    Win_noShift_Attention,
    window_partition,
    window_reverse,
)


def test_window_partition_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    w = window_partition(x, 4)
    assert w.shape == (2 * 4, 4, 4, 3)
    back = window_reverse(w, 4, 8, 8)
    np.testing.assert_allclose(back, x)


def test_gdn_matches_formula():
    C = 4
    gdn = GDN(channels=C)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 2, C))
    variables = gdn.init(jax.random.PRNGKey(1), x)
    out = gdn.apply(variables, x)

    # manual: at init beta=1, gamma=0.1*I (through the reparametrizer)
    xn = np.asarray(x)
    norm = 1.0 + 0.1 * xn ** 2
    np.testing.assert_allclose(np.asarray(out), xn / np.sqrt(norm), atol=1e-4)

    gdn_inv = GDN(channels=C, inverse=True)
    v2 = gdn_inv.init(jax.random.PRNGKey(1), x)
    out_inv = gdn_inv.apply(v2, x)
    np.testing.assert_allclose(np.asarray(out_inv), xn * np.sqrt(norm), atol=1e-4)


def test_subpel_conv_depth_to_space():
    m = SubpelConv(features=2, r=2)
    x = jnp.ones((1, 3, 3, 5))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 6, 6, 2)


def test_win_attention_shapes_and_shift():
    for shift in (0, 2):
        m = WinBasedAttention(dim=8, num_heads=2, window_size=4, shift_size=shift)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 8))
        v = m.init(jax.random.PRNGKey(1), x)
        out = m.apply(v, x)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()


def test_win_attention_translation_within_window():
    """Non-shifted window attention treats windows independently:
    permuting whole windows permutes outputs identically."""
    m = WinBasedAttention(dim=4, num_heads=2, window_size=4, shift_size=0)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    v = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(v, x)
    # swap the two window-rows of the input
    x2 = jnp.concatenate([x[:, 4:], x[:, :4]], axis=1)
    out2 = m.apply(v, x2)
    np.testing.assert_allclose(
        np.asarray(out2),
        np.concatenate([np.asarray(out)[:, 4:], np.asarray(out)[:, :4]], axis=1),
        atol=1e-5,
    )


def test_win_noshift_attention_block():
    m = Win_noShift_Attention(dim=8, num_heads=2, window_size=4, shift_size=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 8))
    v = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(v, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
