import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icm_tpu.models import create_model

pytestmark = pytest.mark.slow

TINY_CODEC = dict(
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


def _rngs():
    return {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}


def test_oj_icm_forward_with_fpn():
    model = create_model("oj_ICM", **TINY_CODEC, task_layers=(1, 1, 1, 1))
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init(_rngs(), x)
    out = model.apply(
        variables, x, training=True, rngs={"noise": jax.random.PRNGKey(3)}
    )
    assert out["decompressedImage"].shape == x.shape
    t = out["Teacher_output_features"]
    s = out["Student_output_features"]
    assert set(t) == {"p2", "p3", "p4", "p5", "p6"}
    for k in t:
        assert t[k].shape == s[k].shape
        assert t[k].shape[-1] == 256
    assert np.all(np.asarray(out["likelihoods"]["y"]) > 0)


def test_seg_oj_icm_two_layers():
    model = create_model(
        "seg_oj_ICM", **TINY_CODEC, task_layers=(1, 1, 1, 1)
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init(_rngs(), x)
    out = model.apply(
        variables, x, training=False
    )
    assert out["decompressedImage"].shape == x.shape
    assert out["machine_x_hat"].shape == x.shape
    assert "machine_likelihoods" in out
    pmf = model.apply(variables, method=model.eb_pmf_data)
    assert len(pmf) == 2


def test_cnn2_detection_outputs():
    model = create_model(
        "cnn2",
        N=16,
        M=24,
        num_slices=6,
        max_support_slices=5,
        hyper_enc_widths=(24, 20, 16, 14, 12),
        hyper_dec_widths=(12, 14, 16, 20, 24),
        cc_widths=(16, 12, 10, 8),
        num_classes=4,
        task_block="basic",
        task_layers=(1, 1, 1, 1),
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init(_rngs(), x)
    out = model.apply(variables, x, training=False)
    A = out["Student_anchors"].shape[1]
    assert out["Student_classification"].shape == (1, A, 4)
    assert out["Student_regression"].shape == (1, A, 4)
    assert len(out["Student_output_features"]) == 3


def test_stf10_prompt_adapters_and_seg_student():
    model = create_model(
        "stf10", **TINY_CODEC, num_seg_classes=5, task_backbone="resnet18"
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init(_rngs(), x)
    out = model.apply(variables, x, training=False)
    assert out["x_hat"].shape == x.shape
    assert out["Student_output"].shape == (1, 64, 64, 5)
    # prompt adapter params exist
    names = set(variables["params"].keys())
    assert any("promot" in n for n in names)


def test_oj_icm_codec_roundtrip():
    """Machine-layer real coder works for oj_ICM via protocol delegation."""
    from icm_tpu.models import CharmCodec

    model = create_model("oj_ICM", **TINY_CODEC, with_task_net=False)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init(_rngs(), x)
    codec = CharmCodec(model, variables)
    enc = codec.compress(x, return_debug=True)
    dec = codec.decompress(enc["strings"], enc["shape"])
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
    )
    assert dec["x_hat"].shape == x.shape


def test_seg_oj_icm_layered_codec_roundtrip():
    from icm_tpu.models.crc_codec import SegOjCodec

    model = create_model("seg_oj_ICM", **TINY_CODEC, with_task_net=False)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init(_rngs(), x)
    codec = SegOjCodec(model, variables)
    enc = codec.compress(x, return_debug=True)
    assert len(enc["strings"]) == 4
    dec = codec.decompress(enc["strings"], enc["shape"], enc["seg_shape"])
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
    )
    np.testing.assert_array_equal(
        np.asarray(dec["seg_y_hat"]), np.asarray(enc["seg_y_hat"])
    )


def test_seg_oj_icm_device_wire_roundtrip():
    """seg_oj_ICM over the on-device entropy wire: both charm layers
    bitexact through the DeviceWireKit transport."""
    from icm_tpu.models.crc_codec import SegOjCodec

    model = create_model("seg_oj_ICM", **TINY_CODEC, with_task_net=False)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init(_rngs(), x)
    codec = SegOjCodec(model, variables, wire="device")
    enc = codec.compress(x, return_debug=True)
    assert len(enc["strings"]) == 4
    dec = codec.decompress(enc["strings"], enc["shape"], enc["seg_shape"])
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
    )
    np.testing.assert_array_equal(
        np.asarray(dec["seg_y_hat"]), np.asarray(enc["seg_y_hat"])
    )


def test_seg_oj_icm_scan_wire_roundtrip():
    """seg_oj_ICM with both charm layers on the scan wire."""
    from icm_tpu.models.crc_codec import SegOjCodec

    model = create_model("seg_oj_ICM", **TINY_CODEC, with_task_net=False)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init(_rngs(), x)
    codec = SegOjCodec(model, variables, wire="device", scan_wire=True)
    enc = codec.compress(x, return_debug=True)
    dec = codec.decompress(enc["strings"], enc["shape"], enc["seg_shape"])
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
    )
    np.testing.assert_array_equal(
        np.asarray(dec["seg_y_hat"]), np.asarray(enc["seg_y_hat"])
    )


def test_cnn2_codec_roundtrip():
    """cnn2 codes with CharmCodec (inherits the WACNN protocol; the
    RetinaNet student is eval-side only)."""
    from icm_tpu.models import CharmCodec

    model = create_model(
        "cnn2",
        N=16, M=24, num_slices=6, max_support_slices=5,
        hyper_enc_widths=(24, 20, 16, 14, 12),
        hyper_dec_widths=(12, 14, 16, 20, 24),
        cc_widths=(16, 12, 10, 8),
        with_task_net=False,
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init(_rngs(), x)
    codec = CharmCodec(model, variables)
    enc = codec.compress(x, return_debug=True)
    dec = codec.decompress(enc["strings"], enc["shape"])
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
    )


def test_stf10_codec_roundtrip():
    """stf10 codes with the generic CharmCodec: every stage (analysis,
    hyper, context, synthesis) goes through the prompt-fused variants."""
    from icm_tpu.models import CharmCodec

    model = create_model("stf10", **TINY_CODEC, with_task_net=False)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init(_rngs(), x)
    codec = CharmCodec(model, variables)
    enc = codec.compress(x, return_debug=True)
    dec = codec.decompress(enc["strings"], enc["shape"])
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"])
    )
    assert dec["x_hat"].shape == x.shape
