from .detector import (
    OrientedRepPointsDetector,
    POINT_STRIDES,
    decode_detections,
    decode_no_nms,
    merge_aug_and_nms,
)
from .fpn import FPN
from .head import OrientedRepPointsHead
from .hrnet import HRNet
from .resnet import ResNet
from .ssd_vgg import SSDVGG
from .swin import SwinTransformer

__all__ = [
    "FPN",
    "HRNet",
    "OrientedRepPointsDetector",
    "OrientedRepPointsHead",
    "POINT_STRIDES",
    "ResNet",
    "SSDVGG",
    "SwinTransformer",
    "decode_detections",
    "decode_no_nms",
    "merge_aug_and_nms",
]
