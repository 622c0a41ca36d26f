from .resnet import ResNetBackbone, resnet18, resnet34, resnet50, resnet101, resnet152
from .fpn import PyramidFeatures, FPN
from .retinanet import RetinaNet, retinanet_resnet50
from .anchors import Anchors, bbox_transform, clip_boxes, nms_numpy
from .losses import focal_loss
from .deeplab import DeepLabV3, deeplabv3_resnet50, deeplab_models

__all__ = [
    "ResNetBackbone",
    "resnet18",
    "resnet34",
    "resnet50",
    "resnet101",
    "resnet152",
    "PyramidFeatures",
    "FPN",
    "RetinaNet",
    "retinanet_resnet50",
    "Anchors",
    "bbox_transform",
    "clip_boxes",
    "nms_numpy",
    "focal_loss",
    "DeepLabV3",
    "deeplabv3_resnet50",
    "deeplab_models",
]
