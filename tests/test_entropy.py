import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icm_tpu.entropy import (
    EntropyBottleneck,
    GaussianConditional,
    build_indexes,
    eb_build_tables,
    gc_build_tables,
    get_scale_table,
    pmf_to_quantized_cdf_np,
)


# --- pmf_to_quantized_cdf ---------------------------------------------------

def test_cdf_sums_to_precision():
    pmf = np.array([0.1, 0.2, 0.3, 0.4], np.float32)
    cdf = pmf_to_quantized_cdf_np(pmf, 16)
    assert cdf[0] == 0 and cdf[-1] == 1 << 16
    assert np.all(np.diff(cdf) > 0)


def test_cdf_zero_mass_steals():
    pmf = np.array([0.0, 1.0, 0.0, 0.0], np.float32)
    cdf = pmf_to_quantized_cdf_np(pmf, 16)
    assert np.all(np.diff(cdf) >= 1)
    assert cdf[-1] == 1 << 16


def test_cdf_proportionality():
    pmf = np.array([0.5, 0.25, 0.25], np.float32)
    cdf = pmf_to_quantized_cdf_np(pmf, 16)
    freqs = np.diff(cdf)
    assert abs(freqs[0] - 2 * freqs[1]) <= 2


# --- GaussianConditional ----------------------------------------------------

def test_gc_likelihood_matches_gaussian_mass():
    gc = GaussianConditional()
    x = jnp.array([[0.0, 1.0, -2.0, 0.3]])
    scales = jnp.full_like(x, 1.0)
    means = jnp.zeros_like(x)
    out, lik = gc.apply({}, x, scales, means, training=False)
    # dequantize mode rounds to integers
    np.testing.assert_allclose(out, np.round(np.asarray(x)))
    # analytic mass of N(0,1) in [round(x)-.5, round(x)+.5]
    from scipy.stats import norm

    v = np.round(np.asarray(x))
    expected = norm.cdf(v + 0.5) - norm.cdf(v - 0.5)
    np.testing.assert_allclose(np.asarray(lik), expected, rtol=1e-5)


def test_gc_scale_lower_bound_grad():
    gc = GaussianConditional()

    def f(scale):
        x = jnp.array([[0.4]])
        _, lik = gc.apply({}, x, scale, jnp.zeros_like(x), training=False)
        return -jnp.sum(jnp.log(lik))

    g = jax.grad(f)(jnp.array([[0.01]]))
    assert np.isfinite(np.asarray(g)).all()


def test_build_indexes_matches_reference_loop():
    table = get_scale_table()
    scales = np.array([0.05, 0.11, 0.2, 1.0, 100.0, 300.0], np.float32)
    idx = np.asarray(build_indexes(jnp.asarray(scales), table))
    # reference loop (entropy_models.py:661-666)
    s = np.maximum(scales, 0.11)
    ref = np.full(s.shape, len(table) - 1, np.int32)
    for t in table[:-1]:
        ref -= (s <= t).astype(np.int32)
    np.testing.assert_array_equal(idx, ref)


def test_gc_tables_shapes():
    table = get_scale_table()
    tables = gc_build_tables(table)
    assert tables.quantized_cdf.shape[0] == 64
    assert np.all(tables.cdf_length == 2 * np.ceil(
        table * -__import__("scipy.stats", fromlist=["norm"]).norm.ppf(0.5e-9)
    ).astype(np.int32) + 3)
    assert np.all(tables.quantized_cdf[:, 0] == 0)
    for i in range(64):
        L = tables.cdf_length[i]
        assert tables.quantized_cdf[i, L - 1] == 1 << 16


# --- EntropyBottleneck ------------------------------------------------------

@pytest.fixture(scope="module")
def eb_setup():
    eb = EntropyBottleneck(channels=8)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 8)) * 3.0
    variables = eb.init({"params": rng, "noise": rng}, x)
    return eb, variables, x


def test_eb_forward_shapes_and_noise(eb_setup):
    eb, variables, x = eb_setup
    out, lik = eb.apply(variables, x, training=True, rngs={"noise": jax.random.PRNGKey(2)})
    assert out.shape == x.shape and lik.shape == x.shape
    # noise mode: |out - x| <= 0.5
    assert np.max(np.abs(np.asarray(out - x))) <= 0.5
    assert np.all(np.asarray(lik) > 0)


def test_eb_eval_rounds_to_median_grid(eb_setup):
    eb, variables, x = eb_setup
    out, lik = eb.apply(variables, x, training=False)
    medians = variables["params"]["quantiles"][:, 0, 1]
    resid = np.asarray(out) - np.asarray(medians)[None, None, None, :]
    np.testing.assert_allclose(resid, np.round(resid), atol=1e-5)


def test_eb_likelihood_sums_to_one(eb_setup):
    """Density integrates to ~1: sum of pmf over a wide integer grid."""
    eb, variables, _ = eb_setup
    # at init the density is ~logistic with scale init_scale=10 — tails are
    # heavy, so integrate over a wide grid
    R = 150
    grid = jnp.tile(jnp.arange(-R, R + 1, dtype=jnp.float32)[:, None], (1, 8))
    grid = grid.reshape(2 * R + 1, 1, 1, 8)
    _, lik = eb.apply(variables, grid, training=False)
    total = np.asarray(lik).sum(axis=(0, 1, 2))
    np.testing.assert_allclose(total, 1.0, atol=2e-3)


def test_eb_aux_loss_finite_and_decreasing_dir(eb_setup):
    eb, variables, _ = eb_setup
    loss = eb.apply(variables, method=EntropyBottleneck.aux_loss)
    assert np.isfinite(float(loss))
    g = jax.grad(
        lambda v: eb.apply(v, method=EntropyBottleneck.aux_loss)
    )(variables)
    # only quantiles receive gradient (stop_gradient on the density params)
    for k, v in g["params"].items():
        arr = np.asarray(v)
        if k == "quantiles":
            assert np.any(arr != 0)
        else:
            np.testing.assert_allclose(arr, 0.0)


def test_eb_tables_consistent_with_likelihood(eb_setup):
    eb, variables, _ = eb_setup
    tables = eb_build_tables(eb, variables)
    assert tables.quantized_cdf.shape[0] == 8
    assert np.all(tables.cdf_length >= 3)
    # pmf from cdf table ~ forward likelihood at integer offsets
    medians = np.asarray(variables["params"]["quantiles"][:, 0, 1])
    c = 0
    L = int(tables.cdf_length[c]) - 2
    offs = int(tables.offset[c])
    xs = (np.arange(L) + offs + medians[c]).astype(np.float32)
    grid = np.zeros((L, 1, 1, 8), np.float32)
    grid[:, 0, 0, c] = xs
    _, lik = eb.apply(variables, jnp.asarray(grid), training=False)
    lik_c = np.asarray(lik)[:, 0, 0, c]
    freqs = np.diff(tables.quantized_cdf[c, : L + 2])[:L] / (1 << 16)
    np.testing.assert_allclose(freqs, lik_c, atol=2e-3)
