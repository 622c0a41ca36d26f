import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icm_tpu.models import WACNN, create_model
from icm_tpu.train import (
    RateDistortionLoss,
    TrainState,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

TINY = dict(
    N=16,
    M=24,
    num_slices=6,
    max_support_slices=5,
    hyper_enc_widths=(24, 20, 16, 14, 12),
    hyper_dec_widths=(12, 14, 16, 20, 24),
    cc_widths=(16, 12, 10, 8),
)


@pytest.fixture(scope="module")
def tiny_model():
    model = WACNN(**TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x
    )
    return model, variables, x


def test_forward_output_contract(tiny_model):
    model, variables, x = tiny_model
    out = model.apply(
        variables, x, training=True, rngs={"noise": jax.random.PRNGKey(3)}
    )
    assert set(out) == {"x_hat", "likelihoods"}
    assert out["x_hat"].shape == x.shape
    assert out["likelihoods"]["y"].shape == (1, 4, 4, TINY["M"])
    assert out["likelihoods"]["z"].shape == (1, 1, 1, 12)
    for lik in out["likelihoods"].values():
        arr = np.asarray(lik)
        assert np.all(arr > 0) and np.all(arr <= 1.0 + 1e-6)


def test_eval_deterministic(tiny_model):
    model, variables, x = tiny_model
    out1 = model.apply(variables, x, training=False)
    out2 = model.apply(variables, x, training=False)
    np.testing.assert_array_equal(np.asarray(out1["x_hat"]), np.asarray(out2["x_hat"]))


def test_train_step_runs_and_updates(tiny_model):
    model, variables, x = tiny_model
    criterion = RateDistortionLoss(lmbda=0.01)
    tx = make_optimizer(1e-4, 1e-3)
    state = TrainState.create(variables["params"], tx)
    step = jax.jit(make_train_step(model, criterion))
    state2, metrics = step(state, x, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["aux_loss"]))
    # params changed (both main and quantile branches)
    q0 = variables["params"]["entropy_bottleneck"]["quantiles"]
    q1 = state2.params["entropy_bottleneck"]["quantiles"]
    assert np.any(np.asarray(q0) != np.asarray(q1))
    g0 = jax.tree_util.tree_leaves(variables["params"]["g_a"])[0]
    g1 = jax.tree_util.tree_leaves(state2.params["g_a"])[0]
    assert np.any(np.asarray(g0) != np.asarray(g1))


def test_eval_step_metrics(tiny_model):
    model, variables, x = tiny_model
    criterion = RateDistortionLoss(lmbda=0.01)
    estep = jax.jit(make_eval_step(model, criterion))
    m = estep(variables["params"], x)
    assert np.isfinite(float(m["psnr"]))
    assert float(m["bpp_loss"]) > 0


def test_registry_default_config():
    model = create_model("cnn")
    assert model.N == 192 and model.M == 320 and model.num_slices == 10
