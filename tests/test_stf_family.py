import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icm_tpu.models import CharmCodec, ZigzagSwinCodec, create_model

pytestmark = pytest.mark.slow

TINY_SWIN = dict(
    embed_dim=8,
    depths=(1, 1, 2, 1),
    num_heads=(1, 2, 4, 8),
    window_size=4,
    patch_size=2,
    hyper_enc_widths=(64, 56, 48, 40, 32),
    hyper_dec_widths=(40, 48, 56, 64, 64),
    cc_widths=(24, 20, 16, 12),
    drop_path_rate=0.1,
)


def _init(model, x):
    return model.init(
        {
            "params": jax.random.PRNGKey(1),
            "noise": jax.random.PRNGKey(2),
            "dropout": jax.random.PRNGKey(3),
        },
        x,
    )


@pytest.mark.parametrize(
    "cfg",
    [
        # stf6-like: zigzag + sliding + mu refiner
        dict(
            num_slices=4, spatial_number=2, support_mode="sliding",
            max_support=6, mean_mode="window", mean_window=1,
            mu_refine=(1, 1), scale_refine=(), lrp_refine=(),
            refine_window=4,
        ),
        # stf5/7-like: channel slices + refiners on all three
        dict(
            num_slices=4, spatial_number=1, support_mode="prefix",
            max_support=2, mean_mode="full", mu_refine=(1,),
            scale_refine=(1,), lrp_refine=(1,), refine_window=4,
        ),
        # stf8-like: zigzag + mean look-ahead window with tail clamp
        dict(
            num_slices=4, spatial_number=2, support_mode="sliding",
            max_support=4, mean_mode="window", mean_window=8,
            mu_refine=(1,), scale_refine=(1,), lrp_refine=(1,),
            refine_window=4,
        ),
    ],
    ids=["stf6like", "stf5like", "stf8like"],
)
def test_family_forward_and_roundtrip(cfg):
    model = ZigzagSwinCodec(**TINY_SWIN, **cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = _init(model, x)

    out = model.apply(
        variables, x, training=True,
        rngs={"noise": jax.random.PRNGKey(4), "dropout": jax.random.PRNGKey(5)},
    )
    assert out["x_hat"].shape == x.shape
    assert np.isfinite(np.asarray(out["x_hat"])).all()
    lik = np.asarray(out["likelihoods"]["y"])
    assert np.all(lik > 0)

    codec = CharmCodec(model, variables)
    enc = codec.compress(x, return_debug=True)
    dec = codec.decompress(enc["strings"], enc["shape"])
    np.testing.assert_array_equal(np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"]))


def test_registry_variant_configs():
    for name, slices, spatial in [
        ("stf5", 12, 1), ("stf6", 6, 2), ("stf7", 12, 1), ("stf8", 6, 2),
    ]:
        m = create_model(name)
        assert isinstance(m, ZigzagSwinCodec)
        assert m.num_slices == slices and m.spatial_number == spatial
    assert create_model("stf6_2").max_support == create_model("stf6").max_support
