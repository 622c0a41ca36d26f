import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icm_tpu.tasks import (
    Anchors,
    DeepLabV3,
    RetinaNet,
    bbox_transform,
    clip_boxes,
    focal_loss,
    nms_numpy,
    resnet18,
)
from icm_tpu.tasks.retinanet import decode_detections

pytestmark = pytest.mark.slow


def test_resnet_feature_pyramid_shapes():
    m = resnet18()
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(v, x)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 64), (1, 8, 8, 128), (1, 4, 4, 256), (1, 2, 2, 512),
    ]


def test_anchors_count_matches_levels():
    a = Anchors()(np.array([64, 64]))
    # levels 3..7 on 64px: 8x8 + 4x4 + 2x2 + 1x1 + 1x1 cells, 9 anchors each
    assert a.shape == (1, (64 + 16 + 4 + 1 + 1) * 9, 4)


def test_bbox_roundtrip_and_nms():
    anchors = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    deltas = np.zeros_like(anchors)
    boxes = bbox_transform(anchors, deltas)
    np.testing.assert_allclose(boxes, anchors, atol=1e-5)
    boxes = clip_boxes(boxes, (25, 25))
    assert boxes.max() <= 25
    keep = nms_numpy(anchors, np.array([0.9, 0.8, 0.7]), 0.5)
    assert list(keep) == [0, 2]  # duplicate suppressed


def test_retinanet_forward_and_decode():
    m = RetinaNet(num_classes=4, block="basic", layers=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    compressH, feats, cls, reg, anchors = m.apply(v, x)
    A = anchors.shape[1]
    assert cls.shape == (1, A, 4) and reg.shape == (1, A, 4)
    assert len(feats) == 3
    # untrained prior -> scores ~0.01 < 0.05 threshold -> no detections
    s, l, b = decode_detections(cls, reg, anchors, (64, 64))
    assert s.shape[0] == 0

    # focal loss with one gt box is finite and positive
    ann = jnp.array([[[5.0, 5.0, 30.0, 30.0, 1.0], [0, 0, 0, 0, -1.0]]])
    cl, rl = focal_loss(cls, reg, anchors[0], ann)
    assert np.isfinite(float(cl)) and float(cl) > 0
    assert np.isfinite(float(rl))


@pytest.mark.parametrize("plus", [False, True])
def test_deeplab_output_shape(plus):
    m = DeepLabV3(num_classes=5, backbone="resnet18", plus=plus)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 64, 64, 5)


def test_deeplab_mobilenet():
    m = DeepLabV3(num_classes=4, backbone="mobilenetv2", plus=True)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 64, 64, 4)


def test_deeplab_xception_and_hrnet_backbones():
    import jax
    import jax.numpy as jnp

    from icm_tpu.tasks.deeplab import DeepLabV3

    x = jnp.zeros((1, 64, 64, 3))
    for backbone, plus in [("xception", True), ("hrnetv2_32", False)]:
        m = DeepLabV3(num_classes=5, backbone=backbone, plus=plus)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.shape == (1, 64, 64, 5), (backbone, out.shape)
