from .detector import OrientedRepPointsDetector, decode_detections, POINT_STRIDES
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
]
