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


def _gdn_ref(x, gamma, beta, inverse):
    n = jnp.einsum("...j,ji->...i", x * x, gamma) + beta
    return x * (jnp.sqrt(n) if inverse else jax.lax.rsqrt(n))


def _gdn_inputs(C=192, seed=7):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, C)), jnp.float32)
    gamma = jnp.asarray(
        np.abs(rng.standard_normal((C, C))) * 0.01 + 1e-3, jnp.float32
    )
    beta = jnp.asarray(np.abs(rng.standard_normal(C)) * 0.1 + 0.5, jnp.float32)
    return x, gamma, beta


@pytest.mark.parametrize("inverse", [False, True])
def test_gdn_fused_forward_matches_einsum(inverse):
    from icm_tpu.nn.gdn_pallas import gdn_fused

    x, gamma, beta = _gdn_inputs()
    out = gdn_fused(x, gamma, beta, inverse=inverse, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_gdn_ref(x, gamma, beta, inverse)),
        atol=1e-6,
    )


@pytest.mark.parametrize("inverse", [False, True])
def test_gdn_fused_backward_matches_autodiff(inverse):
    """The Pallas backward kernel (recompute + fused dual matmuls +
    cross-step dgamma/dbeta accumulation) vs autodiff of the einsum."""
    from icm_tpu.nn.gdn_pallas import gdn_fused

    x, gamma, beta = _gdn_inputs()
    g = jnp.asarray(
        np.random.default_rng(9).standard_normal(x.shape), jnp.float32
    )
    ref = jax.grad(
        lambda *a: jnp.sum(_gdn_ref(*a, inverse) * g), argnums=(0, 1, 2)
    )(x, gamma, beta)
    fused = jax.grad(
        lambda *a: jnp.sum(
            gdn_fused(*a, inverse=inverse, interpret=True) * g
        ),
        argnums=(0, 1, 2),
    )(x, gamma, beta)
    for a, b in zip(ref, fused):
        scale = float(jnp.abs(a).max()) + 1e-12
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=1e-5
        )


def test_gdn_fused_untileable_rows_returns_none():
    """Row counts with no power-of-two tile must hand back to the einsum
    path instead of producing a bad grid."""
    from icm_tpu.nn.gdn_pallas import gdn_fused

    x, gamma, beta = _gdn_inputs()
    x = x.reshape(-1, x.shape[-1])[:7][None, None]  # 7 rows: no tile
    assert gdn_fused(x, gamma, beta, interpret=True) is None


def test_gdn_module_pallas_path_matches_einsum():
    """GDN/IGDN modules with the pallas gate forced on (interpret) equal
    the einsum path the CPU gate uses."""
    from jax.experimental.pallas import tpu as pltpu

    from icm_tpu.nn import set_use_pallas
    from icm_tpu.nn.gdn import GDN

    x = jnp.asarray(
        np.random.default_rng(11).standard_normal((2, 4, 8, 192)) * 0.5,
        jnp.float32,
    )
    for inverse in (False, True):
        m = GDN(192, inverse=inverse)
        v = m.init(jax.random.PRNGKey(0), x)
        set_use_pallas(False)
        ref = m.apply(v, x)
        try:
            set_use_pallas(True)
            with pltpu.force_tpu_interpret_mode():
                out = m.apply(v, x)
        finally:
            set_use_pallas(None)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-6
        )


def test_gdn_fused_bf16_dtypes():
    """bf16 activations: output and dx stay bf16; dgamma/dbeta cast back
    to the (bf16) parameter dtype handed in by the module."""
    from icm_tpu.nn.gdn_pallas import gdn_fused

    x, gamma, beta = _gdn_inputs()
    xb, gb = x.astype(jnp.bfloat16), gamma.astype(jnp.bfloat16)
    out = gdn_fused(xb, gb, beta, interpret=True)
    assert out.dtype == jnp.bfloat16
    grads = jax.grad(
        lambda x_, g_: jnp.sum(
            gdn_fused(x_, g_, beta, interpret=True).astype(jnp.float32)
        ),
        argnums=(0, 1),
    )(xb, gb)
    assert grads[0].dtype == jnp.bfloat16
    assert grads[1].dtype == jnp.bfloat16
    for a in grads:
        assert np.isfinite(np.asarray(a, np.float32)).all()


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
