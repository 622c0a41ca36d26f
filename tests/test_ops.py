import jax
import jax.numpy as jnp
import numpy as np

from icm_tpu.ops import ste_round, lower_bound, NonNegativeParametrizer


def test_ste_round_forward():
    x = jnp.array([-1.7, -0.5, 0.2, 0.5, 2.9])
    np.testing.assert_allclose(ste_round(x), np.round(np.array(x)))


def test_ste_round_grad_identity():
    x = jnp.array([-1.7, 0.2, 2.9])
    g = jax.grad(lambda v: jnp.sum(ste_round(v) * jnp.array([1.0, -2.0, 3.0])))(x)
    np.testing.assert_allclose(g, [1.0, -2.0, 3.0])


def test_lower_bound_forward():
    x = jnp.array([-1.0, 0.05, 0.5])
    out = lower_bound(x, jnp.asarray(0.11))
    np.testing.assert_allclose(out, [0.11, 0.11, 0.5])


def test_lower_bound_grad():
    bound = jnp.asarray(0.11)

    # upstream grad +1: below-bound entries blocked
    g = jax.grad(lambda v: jnp.sum(lower_bound(v, bound)))(
        jnp.array([-1.0, 0.5])
    )
    np.testing.assert_allclose(g, [0.0, 1.0])

    # upstream grad -1 (g<0): passes through even below bound
    g = jax.grad(lambda v: -jnp.sum(lower_bound(v, bound)))(
        jnp.array([-1.0, 0.5])
    )
    np.testing.assert_allclose(g, [-1.0, -1.0])


def test_nonneg_parametrizer_roundtrip():
    p = NonNegativeParametrizer()
    x = jnp.array([0.0, 0.1, 1.0, 10.0])
    v = p.init(x)
    out = p(v)
    np.testing.assert_allclose(out, x, atol=1e-5)
    # always >= 0 even for garbage inputs
    out = p(jnp.array([-5.0, 0.0, 5.0]))
    assert np.all(np.asarray(out) >= 0.0)
