import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icm_tpu.models import create_model

pytestmark = pytest.mark.slow

TINY_SWIN = dict(
    embed_dim=8,
    depths=(1, 1, 1, 1),
    num_heads=(1, 2, 4, 8),
    window_size=4,
    patch_size=2,
    drop_path_rate=0.0,
    hyper_enc_widths=(64, 56, 48, 40, 32),
    hyper_dec_widths=(40, 48, 56, 64, 64),
)


def _init(model, *args):
    return model.init(
        {
            "params": jax.random.PRNGKey(1),
            "noise": jax.random.PRNGKey(2),
            "dropout": jax.random.PRNGKey(3),
        },
        *args,
    )


def _check(out, x):
    assert out["x_hat"].shape == x.shape
    assert np.isfinite(np.asarray(out["x_hat"])).all()
    for k in ("y", "z"):
        assert np.all(np.asarray(out["likelihoods"][k]) > 0)


def test_stf3_masked_transformer():
    # latent 4x4 @ 64ch; mask window 4 -> 1x1 lattice x 4 slices = 4 tokens
    m = create_model("stf3", **TINY_SWIN, num_slices=4, mask_win_size=4)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    v = _init(m, x)
    _check(m.apply(v, x, training=False), x)


def test_stf4_sliding_masked_transformer():
    m = create_model("stf4", **TINY_SWIN, num_slices=4, mask_win_size=2, sliding=5)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    v = _init(m, x)
    _check(m.apply(v, x, training=False), x)


def test_stf2_ar_attention():
    m = create_model(
        "stf2", **TINY_SWIN, num_slices=2, mask_win_size=2, num_sliding=3
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    v = _init(m, x)
    out = m.apply(v, x, training=False)
    _check(out, x)
    # 2 slices x 2x2 windows = 8 AR tokens -> y likelihood covers latent
    assert np.prod(out["likelihoods"]["y"].shape) == 4 * 4 * 64


def test_czigzag_conditional():
    m = create_model(
        "czigzag",
        embed_dim=8,
        depths=(1, 1, 1, 1),
        num_heads=(1, 2, 4, 8),
        window_size=4,
        patch_size=2,
        drop_path_rate=0.0,
        num_slices=2,
        max_support=3,
        support_num=3,
        hyper_depths=(1, 1),
        cc_widths=(24, 16),
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    up = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 64, 3))
    v = _init(m, x, up)
    out = m.apply(v, x, up, training=False)
    _check(out, x)
    # conditioning matters: different context changes the likelihoods
    out2 = m.apply(v, x, jnp.zeros_like(up), training=False)
    assert not np.allclose(
        np.asarray(out["likelihoods"]["y"]), np.asarray(out2["likelihoods"]["y"])
    )


def test_czigzag_codec_roundtrip():
    from icm_tpu.models.crc_codec import CzigzagCodec

    m = create_model(
        "czigzag",
        embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
        window_size=4, patch_size=2, drop_path_rate=0.0,
        num_slices=2, max_support=3, support_num=3,
        hyper_depths=(1, 1), cc_widths=(24, 16),
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    up = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 64, 3))
    v = _init(m, x, up)
    codec = CzigzagCodec(m, v)
    enc = codec.compress(x, up, return_debug=True)
    dec = codec.decompress(enc["strings"], enc["shape"], up)
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
    )
    assert dec["x_hat"].shape == x.shape


def test_czigzag_codec_device_wire_roundtrip():
    """czigzag over the on-device entropy wire: bitexact y_hat roundtrip
    and reconstruction equal to the host wire."""
    from icm_tpu.models.crc_codec import CzigzagCodec

    m = create_model(
        "czigzag",
        embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
        window_size=4, patch_size=2, drop_path_rate=0.0,
        num_slices=2, max_support=3, support_num=3,
        hyper_depths=(1, 1), cc_widths=(24, 16),
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    up = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 64, 3))
    v = _init(m, x, up)
    dev = CzigzagCodec(m, v, wire="device")
    enc = dev.compress(x, up, return_debug=True)
    dec = dev.decompress(enc["strings"], enc["shape"], up)
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
    )
    host = CzigzagCodec(m, v, tables=dev.tables)
    henc = host.compress(x, up)
    hdec = host.decompress(henc["strings"], henc["shape"], up)
    np.testing.assert_allclose(
        np.asarray(dec["x_hat"]), np.asarray(hdec["x_hat"]), atol=1e-6
    )


def test_stf2_codec_roundtrip():
    from icm_tpu.models.crc_codec import Stf2Codec

    m = create_model(
        "stf2", **TINY_SWIN, num_slices=2, mask_win_size=2, num_sliding=3
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    v = _init(m, x)
    codec = Stf2Codec(m, v)
    enc = codec.compress(x, return_debug=True)
    dec = codec.decompress(
        enc["strings"], enc["shape"], enc["out_hw"], enc["lattice"]
    )
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
    )
    assert dec["x_hat"].shape == x.shape


CZ_TINY = dict(
    embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
    window_size=4, patch_size=2, drop_path_rate=0.0,
    num_slices=2, max_support=3, support_num=3,
    hyper_depths=(1, 1), cc_widths=(24, 16),
)


def test_czigzag_scan_equals_unrolled():
    """scan_charm=True (stacked per-slice weights over the conditioned
    zigzag context) reproduces the unrolled AR loop exactly, including
    the hctx look-ahead window and the sliding decoded support."""
    from icm_tpu.models.czigzag import (
        stack_czigzag_params,
        unstack_czigzag_params,
    )

    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    up = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 64, 3))
    unrolled = create_model("czigzag", **CZ_TINY)
    vu = _init(unrolled, x, up)
    out_u = unrolled.apply(vu, x, up, training=False)

    scanned = create_model("czigzag", **CZ_TINY, scan_charm=True)
    vs = _init(scanned, x, up)  # structure reference
    migrated = stack_czigzag_params(dict(vu["params"]), unrolled)
    assert jax.tree_util.tree_structure(
        migrated
    ) == jax.tree_util.tree_structure(dict(vs["params"])), "tree mismatch"
    out_s = scanned.apply({"params": migrated}, x, up, training=False)

    np.testing.assert_allclose(
        np.asarray(out_s["x_hat"]), np.asarray(out_u["x_hat"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_s["likelihoods"]["y"]),
        np.asarray(out_u["likelihoods"]["y"]),
        atol=2e-6,
    )

    # unstack roundtrip: varying-width kernels reconstructed exactly
    back = unstack_czigzag_params(migrated["czigzag_scan"], unrolled)
    for key, tree in back.items():
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            tree,
            vu["params"][key],
        )


def test_czigzag_scan_trains():
    """Gradients flow through the scanned conditioned context."""
    model = create_model("czigzag", **CZ_TINY, scan_charm=True)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    up = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 64, 3))
    v = _init(model, x, up)

    def loss(p):
        out = model.apply(
            {"params": p}, x, up, training=True,
            rngs={
                "noise": jax.random.PRNGKey(3),
                "dropout": jax.random.PRNGKey(4),
            },
        )
        return jnp.mean((out["x_hat"] - x) ** 2) - jnp.mean(
            jnp.log(out["likelihoods"]["y"])
        )

    g = jax.grad(loss)(v["params"])
    k = g["czigzag_scan"]["cc_mean"]["Conv_0"]["kernel"]
    assert np.any(np.asarray(k) != 0)


def test_stf2_scan_tokens_equals_unrolled():
    """scan_tokens=True (token AR loop as one lax.scan; weights shared
    across steps so the param tree is IDENTICAL) reproduces the unrolled
    loop exactly, including the peeled step-0 concat order."""
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    unrolled = create_model(
        "stf2", **TINY_SWIN, num_slices=2, mask_win_size=2, num_sliding=3
    )
    vu = _init(unrolled, x)
    out_u = unrolled.apply(vu, x, training=False)

    scanned = create_model(
        "stf2", **TINY_SWIN, num_slices=2, mask_win_size=2, num_sliding=3,
        scan_tokens=True,
    )
    vs = _init(scanned, x)
    assert jax.tree_util.tree_structure(vu) == jax.tree_util.tree_structure(
        vs
    ), "scan_tokens must not change the parameter tree"
    out_s = scanned.apply(vu, x, training=False)  # same checkpoint verbatim

    np.testing.assert_allclose(
        np.asarray(out_s["x_hat"]), np.asarray(out_u["x_hat"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_s["likelihoods"]["y"]),
        np.asarray(out_u["likelihoods"]["y"]),
        atol=2e-6,
    )


def test_czigzag_codec_scan_wire_roundtrip():
    """czigzag over the SCAN wire (CzigzagScanWire: conditioned zigzag
    AR chain — sliding support + mean/scale/hctx look-ahead windows — as
    one lax.scan shared by both coder sides): bitexact roundtrip, and
    the scan context agrees with the unrolled device-wire protocol up to
    float-accumulation noise."""
    from icm_tpu.models.crc_codec import CzigzagCodec

    m = create_model(
        "czigzag",
        embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
        window_size=4, patch_size=2, drop_path_rate=0.0,
        num_slices=2, max_support=3, support_num=3,
        hyper_depths=(1, 1), cc_widths=(24, 16),
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    up = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 64, 3))
    v = _init(m, x, up)
    scan = CzigzagCodec(m, v, wire="device", scan_wire=True)
    enc = scan.compress(x, up, return_debug=True)
    dec = scan.decompress(enc["strings"], enc["shape"], up)
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
    )
    np.testing.assert_array_equal(
        np.asarray(dec["x_hat"]), np.clip(np.asarray(enc["x_hat"]), 0, 1)
    )

    host = CzigzagCodec(m, v, tables=scan.tables)
    henc = host.compress(x, up, return_debug=True)
    d = np.abs(np.asarray(enc["y_hat"]) - np.asarray(henc["y_hat"]))
    assert np.mean(d > 1e-2) < 0.005, np.mean(d > 1e-2)
    assert np.median(d) < 1e-4


def test_stf2_codec_device_wire_roundtrip():
    """stf2 over the SCAN device wire (Stf2ScanWire: the whole windowed-
    token AR loop — shared attention context, lane rANS, LRP — as one
    lax.scan executed verbatim by both coder sides): bitexact y_hat."""
    from icm_tpu.models.crc_codec import Stf2Codec

    m = create_model(
        "stf2", **TINY_SWIN, num_slices=2, mask_win_size=2, num_sliding=3
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
    v = _init(m, x)
    dev = Stf2Codec(m, v, wire="device")
    enc = dev.compress(x, return_debug=True)
    dec = dev.decompress(
        enc["strings"], enc["shape"], enc["out_hw"], enc["lattice"]
    )
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
    )
    np.testing.assert_array_equal(
        np.asarray(dec["x_hat"]), np.clip(np.asarray(enc["x_hat"]), 0, 1)
    )
