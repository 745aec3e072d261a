"""Point-set training targets (single image, fixed shapes; vmap over batch).

Reference parity (mmdet/core/bbox/pointset_target.py):
  * init stage (init_pointset_target_single :62-121): PointAssigner +
    PseudoSampler; per-point label / label_weight / gt poly / proposal
    weight / 1-based gt index; `unmap` semantics become validity masking
    (invalid points keep zero weights).
  * refine stage (refine_pointset_target_single :173-230): MaxIoUAssigner
    over convex IoU of the init-stage predicted point sets.

pos_weight <= 0 in both oriented configs, so positive label weights are 1.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .assigners import max_iou_assign, point_assign


class Targets(NamedTuple):
    labels: jnp.ndarray  # (N,) int32; 0 = background
    label_weights: jnp.ndarray  # (N,) f32; 0 for invalid (padded) points
    gt_polys: jnp.ndarray  # (N, 8) assigned gt per positive point
    pos_weights: jnp.ndarray  # (N,) f32; 1 for positives
    gt_inds: jnp.ndarray  # (N,) int32 1-based assigned gt (0 = none)


def _build_targets(assigned, points_valid, gt_polys, gt_labels):
    """Shared label/weight construction from a 1-based assignment vector."""
    pos = assigned > 0
    gi = jnp.maximum(assigned - 1, 0)
    labels = jnp.where(pos, gt_labels[gi], 0).astype(jnp.int32)
    label_weights = points_valid.astype(jnp.float32)
    target_polys = jnp.where(pos[:, None], gt_polys[gi], 0.0)
    pos_weights = pos.astype(jnp.float32)
    return Targets(labels, label_weights, target_polys, pos_weights,
                   assigned.astype(jnp.int32))


def init_targets_single(
    points, points_valid, gt_polys, gt_valid, gt_labels,
    scale: float = 4.0, pos_num: int = 1,
) -> Targets:
    """Init-stage targets for one image.

    points: (N, 3) (x, y, stride); gt_polys: (G, 8); gt_labels: (G,) 1-based.
    """
    assigned = point_assign(
        points, points_valid, gt_polys, gt_valid, scale=scale, pos_num=pos_num
    )
    return _build_targets(assigned, points_valid, gt_polys, gt_labels)


def refine_targets_single(
    proposals, points_valid, gt_polys, gt_valid, gt_labels,
    pos_iou_thr: float = 0.1, neg_iou_thr: float = 0.1,
    min_pos_iou: float = 0.0,
) -> Targets:
    """Refine-stage targets for one image.

    proposals: (N, 18) init-stage decoded point sets (caller stop-gradients).
    """
    assigned, _ = max_iou_assign(
        proposals, points_valid, gt_polys, gt_valid,
        pos_iou_thr=pos_iou_thr, neg_iou_thr=neg_iou_thr,
        min_pos_iou=min_pos_iou,
    )
    return _build_targets(assigned, points_valid, gt_polys, gt_labels)
