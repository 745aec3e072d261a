from .detector import (
    OrientedRepPointsDetector,
    POINT_STRIDES,
    decode_detections,
    decode_no_nms,
    merge_aug_and_nms,
)
from .fpn import FPN
from .head import OrientedRepPointsHead
from .resnet import ResNet
from .swin import SwinTransformer

__all__ = [
    "FPN",
    "OrientedRepPointsDetector",
    "OrientedRepPointsHead",
    "POINT_STRIDES",
    "ResNet",
    "SwinTransformer",
    "decode_detections",
    "decode_no_nms",
    "merge_aug_and_nms",
]
