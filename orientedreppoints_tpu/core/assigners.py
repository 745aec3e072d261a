"""Vectorized point-to-gt assignment (single image, fixed shapes).

Two assigners, exact-semantics re-implementations of the reference's
sequential loops as masked matrix ops:

  * point_assign — PointAssigner (mmdet/core/bbox/assigners/point_assigner.py
    :99-133): scale-aware gt level bucketing, per-gt `pos_num` nearest points
    on that level by wh-normalized center distance, closest-gt-wins with
    first-gt-wins ties (the reference's in-order strictly-smaller update).

  * max_iou_assign — MaxIoUAssigner over convex IoU
    (max_iou_assigner.py:91-151): the 4-step rule, including step 4's
    gt_max_assign_all behavior where every proposal tying the per-gt max
    IoU is (re)assigned to that gt, later gts overwriting earlier ones.

Conventions: gt arrays are padded to MAX_GT with `gt_valid` masks; points
carry a `valid` mask (image-border padding). Returns 1-based assigned gt
indices (0 = background), matching the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.geometry import convex_iou

_INF = jnp.inf


def point_assign(
    points: jnp.ndarray,
    points_valid: jnp.ndarray,
    gt_polys: jnp.ndarray,
    gt_valid: jnp.ndarray,
    scale: float = 4.0,
    pos_num: int = 1,
):
    """PointAssigner.

    Args:
      points: (N, 3) rows (x, y, stride).
      points_valid: (N,) bool.
      gt_polys: (G, 8) padded gt polygons.
      gt_valid: (G,) bool.

    Returns:
      assigned: (N,) int32, 0 = background, g+1 = gt index.
    """
    n = points.shape[0]
    g = gt_polys.shape[0]
    xy = points[:, :2]
    lvl = jnp.log2(points[:, 2]).astype(jnp.int32)  # (N,)
    lvl_min = jnp.min(jnp.where(points_valid, lvl, 10**6))
    lvl_max = jnp.max(jnp.where(points_valid, lvl, -(10**6)))

    quad = gt_polys.reshape(g, 4, 2)
    gxmin = jnp.min(quad[..., 0], axis=1)
    gxmax = jnp.max(quad[..., 0], axis=1)
    gymin = jnp.min(quad[..., 1], axis=1)
    gymax = jnp.max(quad[..., 1], axis=1)
    gt_cxy = jnp.stack([(gxmin + gxmax) / 2, (gymin + gymax) / 2], axis=1)
    gt_wh = jnp.stack(
        [jnp.maximum(gxmax - gxmin, 1e-6), jnp.maximum(gymax - gymin, 1e-6)],
        axis=1,
    )
    gt_lvl = (
        (jnp.log2(gt_wh[:, 0] / scale) + jnp.log2(gt_wh[:, 1] / scale)) / 2
    ).astype(jnp.int32)
    gt_lvl = jnp.clip(gt_lvl, lvl_min, lvl_max)

    # (G, N) wh-normalized distances, restricted to the gt's level
    diff = (xy[None, :, :] - gt_cxy[:, None, :]) / gt_wh[:, None, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    usable = (
        (lvl[None, :] == gt_lvl[:, None])
        & points_valid[None, :]
        & gt_valid[:, None]
    )
    dist = jnp.where(usable, dist, _INF)

    # per-gt top pos_num nearest points
    neg_top, top_idx = jax.lax.top_k(-dist, pos_num)  # (G, k)
    top_dist = -neg_top
    selected = jnp.full((g, n), _INF, dtype=dist.dtype)
    rows = jnp.arange(g)[:, None]
    selected = selected.at[rows, top_idx].set(
        jnp.where(jnp.isfinite(top_dist), top_dist, _INF)
    )  # (G, N): finite where point is in gt's top-k

    # closest-gt-wins, earlier gt wins ties (argmin returns first minimum,
    # matching the reference's strictly-smaller in-order update)
    best_gt = jnp.argmin(selected, axis=0)  # (N,)
    best_dist = jnp.min(selected, axis=0)
    assigned = jnp.where(jnp.isfinite(best_dist), best_gt + 1, 0)
    return assigned.astype(jnp.int32)


def max_iou_assign(
    proposals: jnp.ndarray,
    proposals_valid: jnp.ndarray,
    gt_polys: jnp.ndarray,
    gt_valid: jnp.ndarray,
    pos_iou_thr: float = 0.1,
    neg_iou_thr: float = 0.1,
    min_pos_iou: float = 0.0,
):
    """MaxIoUAssigner with convex-hull IoU.

    Args:
      proposals: (N, 18) point sets (refine-stage proposals).
      proposals_valid: (N,) bool.
      gt_polys: (G, 8), gt_valid: (G,).

    Returns:
      assigned: (N,) int32 (0 background, g+1 positive; the reference's -1
      "ignore" state only survives when neg_iou_thr < max_iou < pos_iou_thr,
      impossible with the oriented config's equal thresholds, so it is
      folded to background here);
      overlaps: (G, N) convex IoU matrix (for reuse/debug).
    """
    overlaps = convex_iou(gt_polys, proposals)  # (G, N)
    overlaps = jnp.where(
        gt_valid[:, None] & proposals_valid[None, :], overlaps, -1.0
    )
    assigned = max_iou_assign_from_overlaps(
        overlaps, proposals_valid, gt_valid,
        pos_iou_thr=pos_iou_thr, neg_iou_thr=neg_iou_thr,
        min_pos_iou=min_pos_iou,
    )
    return assigned, overlaps


def max_iou_assign_from_overlaps(
    overlaps: jnp.ndarray,
    proposals_valid: jnp.ndarray,
    gt_valid: jnp.ndarray,
    pos_iou_thr: float = 0.1,
    neg_iou_thr: float = 0.1,
    min_pos_iou: float = 0.0,
):
    """The 4-step MaxIoUAssigner rule over a precomputed (G, N) IoU matrix
    (max_iou_assigner.py:88-151 assign_wrt_overlaps, gt_max_assign_all);
    exact parity verified by executing the reference method in
    tests/test_reference_parity.py."""
    g, n = overlaps.shape

    max_overlaps = jnp.max(overlaps, axis=0)  # (N,)
    argmax_overlaps = jnp.argmax(overlaps, axis=0)
    gt_max_overlaps = jnp.max(overlaps, axis=1)  # (G,)

    # steps 1-3
    assigned = jnp.full((n,), -1, dtype=jnp.int32)
    assigned = jnp.where(
        (max_overlaps >= 0) & (max_overlaps < neg_iou_thr), 0, assigned
    )
    assigned = jnp.where(
        max_overlaps >= pos_iou_thr,
        argmax_overlaps.astype(jnp.int32) + 1,
        assigned,
    )

    # step 4 (gt_max_assign_all): proposals tying a gt's max IoU get that gt;
    # later gts overwrite -> take the LAST qualifying gt per proposal.
    qualifies = (
        (overlaps == gt_max_overlaps[:, None])
        & (gt_max_overlaps >= min_pos_iou)[:, None]
        & gt_valid[:, None]
        & proposals_valid[None, :]
    )  # (G, N)
    any_q = jnp.any(qualifies, axis=0)
    last_q = (g - 1) - jnp.argmax(qualifies[::-1, :], axis=0)
    assigned = jnp.where(any_q, last_q.astype(jnp.int32) + 1, assigned)

    # invalid proposals are never positive; fold residual -1 to background
    assigned = jnp.where(proposals_valid, assigned, 0)
    assigned = jnp.maximum(assigned, 0)
    return assigned
