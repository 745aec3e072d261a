"""OrientedRepPointsDetector: backbone + FPN + head, plus inference decode.

Reference parity:
  * detector composition and simple_test flow
    (mmdet/models/detectors/orientedreppoints_detector.py:24-46,
     single_stage.py extract_feat);
  * decode (head.get_bboxes_single, orientedreppoints_head.py:707-779):
    per-level sigmoid scores -> top nms_pre by max class score ->
    min-area-rect of the refined point set (scaled to image coords) ->
    class-offset rotated NMS (score_thr, iou_thr, max_per_img) carrying the
    raw reppoints alongside, like multi_reppoints in the reference.

The whole decode is fixed-shape and lives under jit; per-image batching via
vmap.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core import points as P
from ..ops.nms import multiclass_rnms
from .fpn import FPN
from .head import OrientedRepPointsHead
from .resnet import ResNet
from .swin import SwinTransformer


class OrientedRepPointsDetector(nn.Module):
    backbone_type: str = "resnet"  # 'resnet' | 'swin'
    depth: int = 50
    num_classes: int = 16
    fpn_out_channels: int = 256
    num_levels: int = 5
    dtype: Any = jnp.float32
    backbone_kwargs: dict = None

    @nn.compact
    def __call__(self, images):
        """images: (B, H, W, 3) normalized. Returns head output dict."""
        kw = self.backbone_kwargs or {}
        if self.backbone_type == "resnet":
            feats = ResNet(depth=self.depth, dtype=self.dtype, name="backbone", **kw)(images)
        elif self.backbone_type == "swin":
            feats = SwinTransformer(dtype=self.dtype, name="backbone", **kw)(images)
        else:
            raise ValueError(self.backbone_type)
        feats = FPN(
            out_channels=self.fpn_out_channels, num_outs=self.num_levels,
            start_level=1, dtype=self.dtype, name="neck",
        )(feats)
        return OrientedRepPointsHead(
            num_classes=self.num_classes, dtype=self.dtype, name="bbox_head",
        )(feats)


POINT_STRIDES = (8, 16, 32, 64, 128)


def decode_detections(
    outs: dict,
    strides: Sequence[int] = POINT_STRIDES,
    nms_pre: int = 2000,
    score_thr: float = 0.05,
    iou_thr: float = 0.4,
    max_per_img: int = 2000,
    scale_factor: float | jnp.ndarray = 1.0,
    with_reppoints: bool = True,
):
    """Decode head outputs into final rotated detections (batched).

    Args:
      outs: dict from the detector (cls_scores/pts_refine per level, NHWC).
      scale_factor: resize factor to undo (rescale=True semantics).

    Returns:
      dets: (B, max_per_img, 27 or 9) [reppoints(18)?, poly(8), score];
      labels: (B, max_per_img) int32 0-based fg labels;
      valid: (B, max_per_img) bool.
    """
    from ..ops.geometry import min_area_rect  # local import to avoid cycles

    cls_scores = outs["cls_scores"]
    pts_refine = outs["pts_refine"]
    b = cls_scores[0].shape[0]

    lvl_scores, lvl_pts = [], []
    for lvl, stride in enumerate(strides):
        s = cls_scores[lvl]
        p = pts_refine[lvl]
        bb, h, w, c = s.shape
        scores = jax.nn.sigmoid(s.reshape(bb, h * w, c).astype(jnp.float32))
        pts_img = P.offset_to_pts(p.astype(jnp.float32), stride)  # (B,HW,18)

        k = min(nms_pre, h * w)
        max_scores = jnp.max(scores, axis=-1)
        _, topk = jax.lax.top_k(max_scores, k)  # (B,k)
        scores = jnp.take_along_axis(scores, topk[..., None], axis=1)
        pts_img = jnp.take_along_axis(pts_img, topk[..., None], axis=1)
        lvl_scores.append(scores)
        lvl_pts.append(pts_img)

    all_scores = jnp.concatenate(lvl_scores, axis=1)  # (B,N,C)
    all_pts = jnp.concatenate(lvl_pts, axis=1)  # (B,N,18)
    all_boxes = jax.vmap(min_area_rect)(all_pts)  # (B,N,8)

    sf = jnp.asarray(scale_factor, dtype=jnp.float32)
    all_boxes = all_boxes / sf
    all_pts = all_pts / sf

    # background pad column (use_sigmoid_cls path, head :762-764)
    padded = jnp.concatenate(
        [jnp.zeros_like(all_scores[..., :1]), all_scores], axis=-1
    )

    def per_image(boxes, scores, pts):
        return multiclass_rnms(
            boxes, scores, score_thr, iou_thr, max_per_img,
            reppoints=pts if with_reppoints else None,
        )

    return jax.vmap(per_image)(all_boxes, padded, all_pts)
