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
from .hrnet import HRNet
from .resnet import ResNet
from .swin import SwinTransformer


class OrientedRepPointsDetector(nn.Module):
    backbone_type: str = "resnet"  # 'resnet' | 'swin' | 'hrnet'
    depth: int = 50
    num_classes: int = 16
    fpn_out_channels: int = 256
    num_levels: int = 5
    fpn_start_level: int | None = None  # default: 1 for resnet, 0 for swin
    fpn_add_extra_convs: bool | None = None  # default: True resnet, False swin
    dtype: Any = jnp.float32
    backbone_kwargs: dict = None
    head_kwargs: dict = None  # OrientedRepPointsHead overrides from config

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        """images: (B, H, W, 3) normalized. Returns head output dict."""
        kw = self.backbone_kwargs or {}
        if self.backbone_type == "resnet":
            feats = ResNet(depth=self.depth, dtype=self.dtype,
                           name="backbone", **kw)(images)
            start, extra = 1, True
        elif self.backbone_type == "swin":
            # swin emits C3..C5 already (out_indices (1,2,3), swin config
            # :22); its FPN uses start_level 0 and maxpool extra levels
            feats = SwinTransformer(dtype=self.dtype, name="backbone",
                                    **kw)(images, deterministic)
            start, extra = 0, False
        elif self.backbone_type == "ssd_vgg":
            # SSD-VGG @512 emits l2norm(relu4_3)/conv7/extras at strides
            # 8/16/32/64/128 in its first num_levels maps — a direct match
            # for the head's point_strides; FPN runs over them with no
            # extra levels (reference ssd_vgg.py:55-153 registry-usable
            # backbone, paired here with the oriented path)
            from .ssd_vgg import SSDVGG

            feats = SSDVGG(dtype=self.dtype, name="backbone",
                           max_outs=self.num_levels, **kw)(images)
            start, extra = 0, False
        elif self.backbone_type == "hrnet":
            # hrnet emits strides 4/8/16/32 like C2..C5; same FPN wiring
            # as resnet (reference mmdet pairs HRNet with HRFPN, but plain
            # FPN over the 4 maps keeps the oriented path uniform)
            feats = HRNet(dtype=self.dtype, name="backbone", **kw)(images)
            start, extra = 1, True
        else:
            raise ValueError(self.backbone_type)
        if self.fpn_start_level is not None:
            start = self.fpn_start_level
        if self.fpn_add_extra_convs is not None:
            extra = self.fpn_add_extra_convs
        feats = FPN(
            out_channels=self.fpn_out_channels, num_outs=self.num_levels,
            start_level=start, add_extra_convs=extra, dtype=self.dtype,
            name="neck",
        )(feats)
        return OrientedRepPointsHead(
            num_classes=self.num_classes, dtype=self.dtype, name="bbox_head",
            **(self.head_kwargs or {}),
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
    pre_nms_cap: int = 4096,
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

    from ..ops.nms import multiclass_rnms_batch

    # batched NMS: one Pallas IoU launch + one suppression scan for the
    # whole image batch (the per-pair temporaries live in kernel VMEM, so
    # batching does not blow up HBM like the vmapped-XLA formulation did)
    return multiclass_rnms_batch(
        all_boxes, padded, score_thr, iou_thr, max_per_img,
        reppoints=all_pts if with_reppoints else None,
        pre_nms_cap=pre_nms_cap,
    )


def decode_no_nms(
    outs: dict,
    strides: Sequence[int] = POINT_STRIDES,
    nms_pre: int = 2000,
):
    """Per-level topk decode WITHOUT NMS (aug_test path, head nms=False).

    Returns (boxes (B, N, 8), padded_scores (B, N, C+1)) in the test-scale
    frame (rescale=False), mirroring get_bboxes(..., nms=False)
    (orientedreppoints_detector.py:118-127).
    """
    from ..ops.geometry import min_area_rect

    lvl_scores, lvl_pts = [], []
    for lvl, stride in enumerate(strides):
        s = outs["cls_scores"][lvl]
        p = outs["pts_refine"][lvl]
        bb, h, w, c = s.shape
        scores = jax.nn.sigmoid(s.reshape(bb, h * w, c).astype(jnp.float32))
        pts_img = P.offset_to_pts(p.astype(jnp.float32), stride)
        k = min(nms_pre, h * w)
        _, topk = jax.lax.top_k(jnp.max(scores, axis=-1), k)
        lvl_scores.append(jnp.take_along_axis(scores, topk[..., None], 1))
        lvl_pts.append(jnp.take_along_axis(pts_img, topk[..., None], 1))
    all_scores = jnp.concatenate(lvl_scores, axis=1)
    all_pts = jnp.concatenate(lvl_pts, axis=1)
    all_boxes = jax.vmap(min_area_rect)(all_pts)
    padded = jnp.concatenate(
        [jnp.zeros_like(all_scores[..., :1]), all_scores], axis=-1
    )
    return all_boxes, padded


def merge_aug_and_nms(
    aug_boxes,
    aug_scores,
    flips,
    img_shape,
    scale_factor,
    score_thr: float = 0.05,
    iou_thr: float = 0.4,
    max_per_img: int = 2000,
    pre_nms_cap: int = 4096,
):
    """Multi-scale / flip TTA merge: map each aug's boxes back to the
    original image frame, concat, one rotated NMS.

    aug_boxes: list of (N, 8) per aug; aug_scores: list of (N, C+1);
    flips: list of bool (horizontal flip per aug);
    img_shape: one (h, w) or a per-aug list — the shape the flip was
    applied in (each aug's own test-scale frame);
    scale_factor: one scalar or a per-aug list of resize factors to undo.

    Mirrors merge_aug_results + rbbox_mapping_back + rnms
    (orientedreppoints_detector.py:81-136, core/bbox/transforms.py:298-301:
    unflip in the aug's img_shape first, THEN divide by its scale_factor).
    """
    n = len(aug_boxes)
    shapes = (
        img_shape if isinstance(img_shape, (list, tuple))
        and isinstance(img_shape[0], (list, tuple))
        else [img_shape] * n
    )
    sfs = (
        list(scale_factor) if isinstance(scale_factor, (list, tuple))
        else [scale_factor] * n
    )
    recovered = []
    for boxes, flip, shp, sf in zip(aug_boxes, flips, shapes, sfs):
        if flip:
            boxes = boxes.at[:, 0::2].set(shp[1] - boxes[:, 0::2] - 1)
        recovered.append(boxes / sf)
    boxes = jnp.concatenate(recovered, axis=0)
    scores = jnp.concatenate(aug_scores, axis=0)
    return multiclass_rnms(
        boxes, scores, score_thr, iou_thr, max_per_img, reppoints=None,
        pre_nms_cap=pre_nms_cap,
    )
