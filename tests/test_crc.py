import jax
import numpy as np
import pytest

from icm_tpu.models import create_model

pytestmark = pytest.mark.slow

TINY = dict(
    N=16,
    M=24,
    mid=32,
    num_slices=2,
    max_support=4,
    support_num=8,
    hyper_enc_widths=(24, 20, 16, 14, 12),
    hyper_dec_widths=(14, 16, 20, 24, 24),
    cc_widths=(20, 12),
)


@pytest.mark.parametrize("name", ["stf9", "stf12", "stf13", "stf14"])
def test_crc_forward(name):
    model = create_model(name, **TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x
    )
    out = model.apply(
        variables, x, training=True, rngs={"noise": jax.random.PRNGKey(3)}
    )
    # reference output contract: decompressedImage + human-layer likelihoods
    assert out["decompressedImage"].shape == x.shape
    assert out["x_hat"].shape == x.shape
    assert out["machine_x_hat"].shape == x.shape
    for k in ("y", "z"):
        assert np.all(np.asarray(out["likelihoods"][k]) > 0)
        assert np.all(np.asarray(out["machine_likelihoods"][k]) > 0)
    if name == "stf13":
        assert out["seg_x_hat"].shape == x.shape
        assert np.all(np.asarray(out["seg_likelihoods"]["y"]) > 0)

    # aux loss covers all bottlenecks
    aux = model.apply(variables, method=model.aux_loss)
    assert np.isfinite(float(aux))
    pmf = model.apply(variables, method=model.eb_pmf_data)
    expected = 3 if name == "stf13" else 2
    assert len(pmf) == expected


def test_stf11_is_stf9():
    m9 = create_model("stf9", **TINY)
    m11 = create_model("stf11", **TINY)
    assert type(m9) is type(m11)


def test_crc_codec_roundtrip():
    """Layered real coder for stf9/stf11: 4 bitstreams, bitexact y_hat."""
    import numpy as np
    from icm_tpu.models.crc_codec import CRCCodec

    model = create_model("stf9", **TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x
    )
    codec = CRCCodec(model, variables)
    enc = codec.compress(x, return_debug=True)
    assert len(enc["strings"]) == 4
    dec = codec.decompress(enc["strings"], enc["shape"], enc["human_shape"])
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
    )
    assert dec["x_hat"].shape == x.shape


@pytest.mark.parametrize("name", ["stf12", "stf14"])
def test_crc_codec_roundtrip_v2_v14(name):
    import numpy as np
    from icm_tpu.models.crc_codec import CRCCodec

    model = create_model(name, **TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x
    )
    codec = CRCCodec(model, variables)
    enc = codec.compress(x, return_debug=True)
    dec = codec.decompress(enc["strings"], enc["shape"], enc["human_shape"])
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
    )
    assert dec["x_hat"].shape == x.shape


def test_crc3_codec_roundtrip():
    """stf13 three-layer real coder: 6 bitstreams, bitexact AR layers."""
    import numpy as np
    from icm_tpu.models.crc_codec import CRC3Codec

    model = create_model("stf13", **TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x
    )
    codec = CRC3Codec(model, variables)
    enc = codec.compress(x, return_debug=True)
    assert len(enc["strings"]) == 6
    dec = codec.decompress(
        enc["strings"], enc["shape"], enc["seg_shape"], enc["human_shape"]
    )
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
    )
    np.testing.assert_array_equal(
        np.asarray(dec["seg_y_hat"]), np.asarray(enc["seg_y_hat"])
    )
    np.testing.assert_allclose(
        np.asarray(dec["x_hat"]),
        np.clip(np.asarray(enc["x_hat"]), 0, 1),
        atol=1e-6,
    )


def test_crc_codec_device_wire_roundtrip():
    """stf9 over the on-device entropy wire (DeviceWireKit): bitexact
    y_hat roundtrip, and the reconstruction matches the host wire (the
    wires differ only in entropy-coding transport, never in float math)."""
    from icm_tpu.models.crc_codec import CRCCodec

    model = create_model("stf9", **TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x
    )
    dev = CRCCodec(model, variables, wire="device")
    enc = dev.compress(x, return_debug=True)
    assert len(enc["strings"]) == 4 and len(enc["strings"][0]) == 2
    dec = dev.decompress(enc["strings"], enc["shape"], enc["human_shape"])
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
    )
    np.testing.assert_array_equal(
        np.asarray(dec["x_hat"]),
        np.clip(np.asarray(enc["x_hat"]), 0, 1),
    )

    host = CRCCodec(model, variables, tables=dev.tables)
    henc = host.compress(x)
    hdec = host.decompress(henc["strings"], henc["shape"], henc["human_shape"])
    np.testing.assert_allclose(
        np.asarray(dec["x_hat"]), np.asarray(hdec["x_hat"]), atol=1e-6
    )


def test_crc3_codec_device_wire_roundtrip():
    """stf13 three-layer coder over the on-device entropy wire: all three
    layers (machine charm, seg charm, human one-shot) bitexact, and the
    reconstruction matches the host wire."""
    from icm_tpu.models.crc_codec import CRC3Codec

    model = create_model("stf13", **TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x
    )
    dev = CRC3Codec(model, variables, wire="device")
    enc = dev.compress(x, return_debug=True)
    assert len(enc["strings"]) == 6
    dec = dev.decompress(
        enc["strings"], enc["shape"], enc["seg_shape"], enc["human_shape"]
    )
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
    )
    np.testing.assert_array_equal(
        np.asarray(dec["seg_y_hat"]), np.asarray(enc["seg_y_hat"])
    )

    host = CRC3Codec(model, variables, tables=dev.tables)
    henc = host.compress(x)
    hdec = host.decompress(
        henc["strings"], henc["shape"], henc["seg_shape"], henc["human_shape"]
    )
    np.testing.assert_allclose(
        np.asarray(dec["x_hat"]), np.asarray(hdec["x_hat"]), atol=1e-6
    )


def test_crc_codec_scan_wire_roundtrip():
    """stf9 over the SCAN wire (whole AR chain as one lax.scan shared by
    encoder/decoder): bitexact roundtrip, and the scan context agrees
    with the unrolled protocol up to float-accumulation noise (isolated
    rounding-boundary flips move y_hat by a quantization step, so the
    check is distributional, as in tests/test_zigzag_scan.py)."""
    from icm_tpu.models.crc_codec import CRCCodec

    model = create_model("stf9", **TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x
    )
    scan = CRCCodec(model, variables, wire="device", scan_wire=True)
    enc = scan.compress(x, return_debug=True)
    dec = scan.decompress(enc["strings"], enc["shape"], enc["human_shape"])
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
    )
    np.testing.assert_array_equal(
        np.asarray(dec["x_hat"]),
        np.clip(np.asarray(enc["x_hat"]), 0, 1),
    )

    host = CRCCodec(model, variables, tables=scan.tables)
    henc = host.compress(x, return_debug=True)
    d = np.abs(np.asarray(enc["y_hat"]) - np.asarray(henc["y_hat"]))
    assert np.mean(d > 1e-2) < 0.005, np.mean(d > 1e-2)
    assert np.median(d) < 1e-4


def test_crc3_codec_scan_wire_roundtrip():
    """stf13 with BOTH charm layers on the scan wire."""
    from icm_tpu.models.crc_codec import CRC3Codec

    model = create_model("stf13", **TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x
    )
    codec = CRC3Codec(model, variables, wire="device", scan_wire=True)
    enc = codec.compress(x, return_debug=True)
    dec = codec.decompress(
        enc["strings"], enc["shape"], enc["seg_shape"], enc["human_shape"]
    )
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
    )
    np.testing.assert_array_equal(
        np.asarray(dec["seg_y_hat"]), np.asarray(enc["seg_y_hat"])
    )


def test_crc_codec_pipelined_roundtrip():
    """Symmetric stream-group pipelining (threaded groups) on the layered
    coder: bitexact y_hat vs the encoder within the pipelined config."""
    from icm_tpu.models.crc_codec import CRCCodec

    model = create_model("stf9", **TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x
    )
    codec = CRCCodec(model, variables)
    enc = codec.compress(x, return_debug=True, pipeline_groups=2)
    assert len(enc["strings"]) == 4 and len(enc["strings"][0]) == 2
    dec = codec.decompress(
        enc["strings"], enc["shape"], enc["human_shape"], pipeline_groups=2
    )
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
    )
    # and close to the serial config (XLA floats vary with batch shape)
    enc1 = codec.compress(x)
    dec1 = codec.decompress(enc1["strings"], enc1["shape"], enc1["human_shape"])
    np.testing.assert_allclose(
        np.asarray(dec["x_hat"]), np.asarray(dec1["x_hat"]), atol=1e-5
    )
