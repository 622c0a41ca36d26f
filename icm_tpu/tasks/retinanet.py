"""RetinaNet detector (NHWC flax).

Behavioral parity with the reference (reference:
``compressai/models/retinanet/model.py``): ResNet backbone -> P3-P7
pyramid -> shared regression head (4x conv256 + 4A outputs, model.py:
68-104) and classification head (4x conv256 + KA sigmoid outputs,
107-152); forward returns the reference tuple
``(compressH, output_features, classification, regression, anchors)``
(model.py:231-259); the "student" variant consumes a decompressed image
(model.py:308+). Detection decode (scores/labels/boxes via NMS) runs
host-side in ``decode_detections``.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .anchors import Anchors, bbox_transform, clip_boxes, nms_numpy
from .fpn import PyramidFeatures
from .resnet import ResNetBackbone


class RegressionHead(nn.Module):
    num_anchors: int = 9
    feature_size: int = 256

    @nn.compact
    def __call__(self, x):
        for i in range(4):
            x = nn.Conv(
                self.feature_size, (3, 3), padding=((1, 1), (1, 1)),
                name=f"conv{i + 1}",
            )(x)
            x = nn.relu(x)
        x = nn.Conv(
            self.num_anchors * 4, (3, 3), padding=((1, 1), (1, 1)),
            name="output",
        )(x)
        B = x.shape[0]
        return x.reshape(B, -1, 4)


class ClassificationHead(nn.Module):
    num_classes: int
    num_anchors: int = 9
    feature_size: int = 256
    prior: float = 0.01

    @nn.compact
    def __call__(self, x):
        for i in range(4):
            x = nn.Conv(
                self.feature_size, (3, 3), padding=((1, 1), (1, 1)),
                name=f"conv{i + 1}",
            )(x)
            x = nn.relu(x)
        bias_init = float(-np.log((1.0 - self.prior) / self.prior))
        x = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3),
            padding=((1, 1), (1, 1)),
            bias_init=nn.initializers.constant(bias_init),
            name="output",
        )(x)
        x = jax.nn.sigmoid(x)
        B = x.shape[0]
        return x.reshape(B, -1, self.num_classes)


class RetinaNet(nn.Module):
    num_classes: int = 80
    block: str = "bottleneck"
    layers: Tuple[int, ...] = (3, 4, 6, 3)
    train_bn: bool = False

    def setup(self):
        self.backbone = ResNetBackbone(
            block=self.block, layers=self.layers, train_bn=self.train_bn
        )
        self.fpn = PyramidFeatures()
        self.regression = RegressionHead()
        self.classification = ClassificationHead(self.num_classes)
        self._anchors = Anchors()

    def __call__(self, x):
        """x: (B, H, W, 3). Returns the reference 5-tuple."""
        c2, c3, c4, c5 = self.backbone(x)
        features = self.fpn([c3, c4, c5])
        regression = jnp.concatenate(
            [self.regression(f) for f in features], axis=1
        )
        classification = jnp.concatenate(
            [self.classification(f) for f in features], axis=1
        )
        anchors = jnp.asarray(self._anchors(x.shape[1:3]))
        compressH = c2
        output_features = [c3, c4, c5]
        return compressH, output_features, classification, regression, anchors


def retinanet_resnet50(num_classes: int = 80, **kw) -> RetinaNet:
    return RetinaNet(num_classes=num_classes, **kw)


def decode_detections(
    classification,
    regression,
    anchors,
    image_shape_hw,
    score_thresh: float = 0.05,
    iou_thresh: float = 0.5,
):
    """Host-side per-image NMS decode (reference model.py commented eval
    path, 265-305). Returns (scores, labels, boxes) numpy arrays."""
    cls = np.asarray(classification)[0]  # (A, K)
    reg = np.asarray(regression)[0]
    anc = np.asarray(anchors)[0]
    boxes_all = clip_boxes(bbox_transform(anc, reg), image_shape_hw)

    scores_out, labels_out, boxes_out = [], [], []
    for k in range(cls.shape[1]):
        scores = cls[:, k]
        mask = scores > score_thresh
        if not mask.any():
            continue
        keep = nms_numpy(boxes_all[mask], scores[mask], iou_thresh)
        scores_out.append(scores[mask][keep])
        labels_out.append(np.full(keep.shape[0], k, np.int64))
        boxes_out.append(boxes_all[mask][keep])
    if not scores_out:
        return (
            np.zeros((0,), np.float32),
            np.zeros((0,), np.int64),
            np.zeros((0, 4), np.float32),
        )
    return (
        np.concatenate(scores_out),
        np.concatenate(labels_out),
        np.concatenate(boxes_out),
    )
