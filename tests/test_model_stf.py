import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icm_tpu.models import CharmCodec, SymmetricalTransFormer

pytestmark = pytest.mark.slow

TINY = dict(
    embed_dim=8,
    depths=(1, 1, 2, 1),
    num_heads=(1, 2, 4, 8),
    window_size=4,
    patch_size=2,
    num_slices=4,
    drop_path_rate=0.1,
    hyper_enc_widths=(64, 56, 48, 40, 32),
    hyper_dec_widths=(40, 48, 56, 64, 64),
    cc_widths=(24, 20, 16, 12),
)


@pytest.fixture(scope="module")
def stf_setup():
    model = SymmetricalTransFormer(**TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init(
        {
            "params": jax.random.PRNGKey(1),
            "noise": jax.random.PRNGKey(2),
            "dropout": jax.random.PRNGKey(3),
        },
        x,
    )
    return model, variables, x


def test_stf_forward_contract(stf_setup):
    model, variables, x = stf_setup
    out = model.apply(
        variables,
        x,
        training=True,
        rngs={"noise": jax.random.PRNGKey(4), "dropout": jax.random.PRNGKey(5)},
    )
    assert out["x_hat"].shape == x.shape
    # latent: 64 / 2 (patch) / 2^3 (3 merges) = 4; C = 8*embed_dim
    assert out["likelihoods"]["y"].shape == (1, 4, 4, 8 * TINY["embed_dim"])
    assert out["likelihoods"]["z"].shape == (1, 1, 1, TINY["hyper_enc_widths"][-1])
    assert np.isfinite(np.asarray(out["x_hat"])).all()


def test_stf_eval_deterministic(stf_setup):
    model, variables, x = stf_setup
    o1 = model.apply(variables, x, training=False)
    o2 = model.apply(variables, x, training=False)
    np.testing.assert_array_equal(np.asarray(o1["x_hat"]), np.asarray(o2["x_hat"]))


def test_stf_codec_roundtrip(stf_setup):
    model, variables, x = stf_setup
    codec = CharmCodec(model, variables)
    enc = codec.compress(x, return_debug=True)
    dec = codec.decompress(enc["strings"], enc["shape"])
    np.testing.assert_array_equal(np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"]))
    assert dec["x_hat"].shape == x.shape
