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


@pytest.mark.parametrize(
    "cfg",
    [
        dict(
            num_slices=4, spatial_number=2, support_mode="sliding",
            max_support=6, mean_mode="window", mean_window=1,
            mu_refine=(1, 1), scale_refine=(), lrp_refine=(),
            refine_window=4,
        ),
        dict(
            num_slices=4, spatial_number=1, support_mode="prefix",
            max_support=2, mean_mode="full", mu_refine=(1,),
            scale_refine=(1,), lrp_refine=(1,), refine_window=4,
        ),
        dict(
            num_slices=4, spatial_number=2, support_mode="sliding",
            max_support=4, mean_mode="window", mean_window=8,
            mu_refine=(1,), scale_refine=(1,), lrp_refine=(1,),
            refine_window=4,
        ),
    ],
    ids=["stf6like", "stf5like", "stf8like"],
)
def test_zigzag_scan_equals_unrolled(cfg):
    """scan_charm=True (stacked per-slice weights incl. Swin refiners)
    reproduces the unrolled AR loop exactly, across all three context
    shapes (sliding/prefix supports, full/window conditioning)."""
    from icm_tpu.models.stf_family import (
        stack_zigzag_params,
        unstack_zigzag_params,
    )

    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    unrolled = ZigzagSwinCodec(**TINY_SWIN, **cfg)
    vu = _init(unrolled, x)
    out_u = unrolled.apply(vu, x, training=False)

    scanned = ZigzagSwinCodec(**TINY_SWIN, **cfg, scan_charm=True)
    vs = _init(scanned, x)  # structure reference
    migrated = stack_zigzag_params(dict(vu["params"]), unrolled)
    assert jax.tree_util.tree_structure(
        migrated
    ) == jax.tree_util.tree_structure(dict(vs["params"])), "tree mismatch"
    out_s = scanned.apply({"params": migrated}, x, training=False)

    np.testing.assert_allclose(
        np.asarray(out_s["x_hat"]), np.asarray(out_u["x_hat"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_s["likelihoods"]["y"]),
        np.asarray(out_u["likelihoods"]["y"]),
        atol=2e-6,
    )

    # unstack roundtrip: varying-width kernels reconstructed exactly
    back = unstack_zigzag_params(migrated["zigzag_scan"], unrolled)
    for key, tree in back.items():
        ref = vu["params"][key]
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            tree,
            ref,
        )


def test_zigzag_scan_trains():
    """Gradients flow through the scanned refiners."""
    cfg = dict(
        num_slices=4, spatial_number=1, support_mode="sliding",
        max_support=2, mean_mode="full", mu_refine=(1,),
        scale_refine=(), lrp_refine=(), refine_window=4,
    )
    model = ZigzagSwinCodec(**TINY_SWIN, **cfg, scan_charm=True)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    v = _init(model, x)

    def loss(p):
        out = model.apply(
            {"params": p}, x, training=True,
            rngs={
                "noise": jax.random.PRNGKey(3),
                "dropout": jax.random.PRNGKey(4),
            },
        )
        return jnp.mean((out["x_hat"] - x) ** 2) - jnp.mean(
            jnp.log(out["likelihoods"]["y"])
        )

    g = jax.grad(loss)(v["params"])
    scan = g["zigzag_scan"]
    k = scan["cc_mean"]["Conv_0"]["kernel"]
    assert np.any(np.asarray(k) != 0)
    rk = jax.tree_util.tree_leaves(scan["mu_refine"])[0]
    assert np.any(np.asarray(rk) != 0)


@pytest.mark.parametrize(
    "cfg",
    [
        dict(
            num_slices=4, spatial_number=2, support_mode="sliding",
            max_support=6, mean_mode="window", mean_window=1,
            mu_refine=(1, 1), scale_refine=(), lrp_refine=(),
            refine_window=4,
        ),
        dict(
            num_slices=4, spatial_number=1, support_mode="prefix",
            max_support=2, mean_mode="full", mu_refine=(1,),
            scale_refine=(1,), lrp_refine=(1,), refine_window=4,
        ),
        dict(
            num_slices=4, spatial_number=2, support_mode="sliding",
            max_support=4, mean_mode="window", mean_window=8,
            mu_refine=(1,), scale_refine=(1,), lrp_refine=(1,),
            refine_window=4,
        ),
    ],
    ids=["stf6like", "stf5like", "stf8like"],
)
def test_scan_wire_roundtrip(cfg):
    """stf5-8 family over the SCAN wire (ZigzagSwinScanWire: whole AR
    chain incl. the per-slice Swin refiners as one lax.scan shared by
    both coder sides): bitexact y_hat roundtrip across all support/cond
    modes."""
    from icm_tpu.models.device_codec import DeviceWireCodec

    model = ZigzagSwinCodec(**TINY_SWIN, **cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = _init(model, x)
    scan = DeviceWireCodec(
        model, variables, lanes_per_image=4, scan_wire=True
    )
    enc = scan.compress(x, return_debug=True)
    dec = scan.decompress(enc["strings"], enc["shape"])
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
    )

    host = CharmCodec(model, variables, tables=scan.tables)
    henc = host.compress(x, return_debug=True)
    d = np.abs(np.asarray(enc["y_hat"]) - np.asarray(henc["y_hat"]))
    assert np.mean(d > 1e-2) < 0.005, np.mean(d > 1e-2)
