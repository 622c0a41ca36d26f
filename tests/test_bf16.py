"""bf16 activation-pipeline policy (nn.set_activation_dtype): transforms
run bf16 on the MXU, entropy math stays f32, and the coder path (which
never enables the policy) is unaffected."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icm_tpu.models import WACNN
from icm_tpu.nn import set_activation_dtype
from icm_tpu.train import RateDistortionLoss, compute_bpp

TINY = dict(
    N=16,
    M=24,
    num_slices=6,
    max_support_slices=5,
    hyper_enc_widths=(24, 20, 16, 14, 12),
    hyper_dec_widths=(12, 14, 16, 20, 24),
    cc_widths=(16, 12, 10, 8),
)


@pytest.fixture(autouse=True)
def _reset_policy():
    yield
    set_activation_dtype(None)


@pytest.fixture(scope="module")
def model_and_vars():
    model = WACNN(**TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x
    )
    return model, variables, x


def test_bf16_forward_close_to_f32(model_and_vars):
    model, variables, x = model_and_vars
    out32 = model.apply(variables, x, training=False)

    set_activation_dtype(jnp.bfloat16)
    out16 = model.apply(variables, x, training=False)

    # entropy math pinned to f32 regardless of the activation policy
    assert out16["likelihoods"]["y"].dtype == jnp.float32
    assert out16["likelihoods"]["z"].dtype == jnp.float32

    a = np.asarray(out16["x_hat"], np.float32)
    b = np.asarray(out32["x_hat"], np.float32)
    assert np.isfinite(a).all()
    # bf16 has ~3 decimal digits; reconstructions agree to bf16 tolerance
    assert np.abs(a - b).mean() < 0.01

    bpp32 = float(compute_bpp(out32["likelihoods"], 64 * 64 * 2))
    bpp16 = float(compute_bpp(out16["likelihoods"], 64 * 64 * 2))
    assert bpp16 == pytest.approx(bpp32, rel=0.05)


def test_bf16_params_stay_f32_masters(model_and_vars):
    model, variables, x = model_and_vars
    set_activation_dtype(jnp.bfloat16)
    # policy affects compute dtype only; the stored params remain f32
    v2 = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x
    )
    dtypes = {p.dtype for p in jax.tree_util.tree_leaves(v2["params"])}
    assert dtypes == {jnp.dtype(jnp.float32)}


def test_bf16_train_grads_finite(model_and_vars):
    model, variables, x = model_and_vars
    set_activation_dtype(jnp.bfloat16)
    loss_fn = RateDistortionLoss(lmbda=0.01)

    def loss(params):
        out = model.apply(
            {"params": params}, x, rngs={"noise": jax.random.PRNGKey(5)}
        )
        return loss_fn(out, x)["loss"]

    val, grads = jax.value_and_grad(loss)(variables["params"])
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g, np.float32)).all() for g in leaves)
    # master-precision grads: f32 out of the loss
    assert float(val) > 0
