"""Fused window-attention Pallas kernel: interpret-mode equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icm_tpu.nn.pallas_kernels import (
    class_masks,
    window_attention_fused,
    window_attention_reference,
    window_class_map,
)


def _rand(shape, key):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize("n_cls", [1, 4])
def test_fused_matches_reference(n_cls):
    W, H, N, D = 8, 2, 16, 8
    q, k, v = _rand((W, H, N, D), 0), _rand((W, H, N, D), 1), _rand((W, H, N, D), 2)
    bias = _rand((n_cls, H, N, N), 3)
    cls_idx = jnp.asarray(np.arange(W) % n_cls, jnp.int32)

    ref = window_attention_reference(q, k, v, bias, cls_idx)
    out = window_attention_fused(q, k, v, bias, cls_idx, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_class_masks_match_full_masks():
    """Folded per-class masks reproduce the per-window SW-MSA masks."""
    from icm_tpu.nn.layers import shifted_window_mask

    H = W = 16
    ws, ss = 4, 2
    n_cls, cls = window_class_map(H, W, ws, ss)
    cm = class_masks(H, W, ws, ss)
    full = shifted_window_mask(H, W, ws, ss)
    assert n_cls == 4
    for w in range(full.shape[0]):
        np.testing.assert_array_equal(cm[cls[w]], full[w])


def test_module_fused_path_matches_dense_path():
    """WinBasedAttention with the pallas path (forced, interpret) equals
    the jnp path."""
    from jax.experimental.pallas import tpu as pltpu

    from icm_tpu.nn import WinBasedAttention, set_use_pallas

    m = WinBasedAttention(dim=8, num_heads=2, window_size=4, shift_size=2)
    x = _rand((1, 8, 8, 8), 5)
    v = m.init(jax.random.PRNGKey(0), x)
    set_use_pallas(False)
    ref = m.apply(v, x)
    try:
        set_use_pallas(True)
        with pltpu.force_tpu_interpret_mode():
            out = m.apply(v, x)
    finally:
        set_use_pallas(None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_gradients_match_reference():
    """Training path: reverse-mode grads through the fused kernel (custom
    VJP backed by the XLA reference) equal grads of the reference."""
    import jax

    rng = np.random.default_rng(3)
    W, H, N, D, n_cls = 4, 2, 16, 8, 4
    q, k, v = (jnp.asarray(rng.normal(size=(W, H, N, D)), jnp.float32)
               for _ in range(3))
    bias = jnp.asarray(rng.normal(size=(n_cls, H, N, N)), jnp.float32)
    cls_idx = jnp.asarray(rng.integers(0, n_cls, W), jnp.int32)

    def loss_fused(q, k, v, bias):
        out = window_attention_fused(q, k, v, bias, cls_idx, interpret=True)
        return jnp.sum(out ** 2)

    def loss_ref(q, k, v, bias):
        out = window_attention_reference(q, k, v, bias, cls_idx)
        return jnp.sum(out ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_gradients_bf16_policy():
    """Training with the bf16 activation policy must differentiate
    through the fused kernel (the cotangent arrives bf16 while the
    reference path promotes to f32 — the VJP aligns dtypes)."""
    import jax

    rng = np.random.default_rng(5)
    W, H, N, D, n_cls = 4, 2, 16, 8, 4
    q, k, v = (jnp.asarray(rng.normal(size=(W, H, N, D)), jnp.bfloat16)
               for _ in range(3))
    bias = jnp.asarray(rng.normal(size=(n_cls, H, N, N)), jnp.float32)
    cls_idx = jnp.asarray(rng.integers(0, n_cls, W), jnp.int32)

    def loss(q, k, v, bias):
        out = window_attention_fused(q, k, v, bias, cls_idx, interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, inp in zip(g, (q, k, v, bias)):
        assert a.dtype == inp.dtype
        assert np.isfinite(np.asarray(a, np.float32)).all()
