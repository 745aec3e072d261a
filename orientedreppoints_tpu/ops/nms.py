"""Rotated polygon NMS on device (TPU), fixed shapes, no host round-trips.

Reference behavior being reproduced:
  * rnms CUDA kernel — greedy suppression over score-sorted (n, 9) poly+score
    rows with exact polygon IoU (mmdet/ops/nms/src/rnms_kernel.cu:131-258);
    the reference runs the pairwise mask on GPU and the sequential
    suppression scan on the host — here both stay on device: the pairwise
    exact-IoU matrix is one vmapped batch and the greedy scan is a
    lax.fori_loop over score rank.
  * multiclass_rnms — per-class NMS via the class-offset trick
    (mmdet/core/post_processing/bbox_nms.py:93-182), score threshold,
    optional reppoints carried through, top max_per_img by score.

All entry points take/return fixed-size arrays with validity masks so they
can live inside jit with static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .geometry import quad_iou_matrix

_NEG = -1e9


def rotated_nms_mask(
    quads: jnp.ndarray,
    scores: jnp.ndarray,
    iou_thr: float,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Greedy rotated NMS.

    Args:
      quads: (N, 8) polygons.
      scores: (N,) scores; processed in descending order.
      iou_thr: suppression threshold (exact polygon IoU).
      valid: optional (N,) bool; invalid rows are never kept.

    Returns:
      keep: (N,) bool mask in the ORIGINAL order.
    """
    from .pallas_quad_iou import quad_iou_matrix_pallas

    n = quads.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    order = jnp.argsort(jnp.where(valid, scores, _NEG))[::-1]
    squads = quads[order]
    svalid = valid[order]
    iou = quad_iou_matrix_pallas(squads, squads)  # fused Pallas tile kernel
    over = iou > iou_thr

    def body(i, state):
        suppressed = state
        keep_i = svalid[i] & ~suppressed[i]
        new_sup = suppressed | (keep_i & over[i] & (jnp.arange(n) > i))
        return new_sup

    suppressed = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), dtype=bool))
    keep_sorted = svalid & ~suppressed
    keep = jnp.zeros((n,), dtype=bool).at[order].set(keep_sorted)
    return keep


def multiclass_rnms(
    bboxes: jnp.ndarray,
    scores: jnp.ndarray,
    score_thr: float,
    iou_thr: float,
    max_per_img: int,
    reppoints: jnp.ndarray | None = None,
    pre_nms_cap: int = 4096,
):
    """Multi-class rotated NMS with fixed output shapes.

    Args:
      bboxes: (N, 8) decoded polys (shared across classes, like the
        reference single-column path bbox_nms.py:123-124).
      scores: (N, C+1) class scores; column 0 is the background pad and is
        ignored (bbox_nms.py:129).
      score_thr: minimum class score.
      iou_thr: rotated NMS IoU threshold.
      max_per_img: fixed number of output rows.
      reppoints: optional (N, 18) point sets carried to the output
        (bbox_nms.py:169-172 prepends reppoints to the output row).
      pre_nms_cap: static cap on candidates entering NMS (top by score).

    Returns:
      dets: (max_per_img, 9) [poly(8), score] or (max_per_img, 27)
        [reppoints(18), poly(8), score] when reppoints given.
      labels: (max_per_img,) int32, 0-based foreground labels.
      det_valid: (max_per_img,) bool.
    """
    n = bboxes.shape[0]
    num_classes = scores.shape[1] - 1
    cls_scores = scores[:, 1:]  # (N, C)

    flat_scores = cls_scores.reshape(-1)  # (N*C,)
    flat_labels = jnp.tile(jnp.arange(num_classes, dtype=jnp.int32), (n,))
    flat_box_idx = jnp.repeat(jnp.arange(n, dtype=jnp.int32), num_classes)
    cand_ok = flat_scores > score_thr

    cap = min(pre_nms_cap, n * num_classes)
    top_scores, top_idx = jax.lax.top_k(
        jnp.where(cand_ok, flat_scores, _NEG), cap
    )
    top_valid = top_scores > score_thr
    top_labels = flat_labels[top_idx]
    top_boxes = bboxes[flat_box_idx[top_idx]]  # (cap, 8)

    # class-offset trick: distinct classes never overlap during NMS
    max_coord = jnp.max(jnp.where(top_valid[:, None], top_boxes, 0.0))
    offsets = top_labels.astype(top_boxes.dtype) * (max_coord + 1.0)
    boxes_for_nms = top_boxes + offsets[:, None]

    keep = rotated_nms_mask(boxes_for_nms, top_scores, iou_thr, top_valid)

    out_scores, out_rank = jax.lax.top_k(
        jnp.where(keep, top_scores, _NEG), min(max_per_img, cap)
    )
    det_valid = out_scores > score_thr
    out_boxes = top_boxes[out_rank]
    out_labels = jnp.where(det_valid, top_labels[out_rank], 0)

    if reppoints is not None:
        out_pts = reppoints[flat_box_idx[top_idx]][out_rank]
        dets = jnp.concatenate(
            [out_pts, out_boxes, out_scores[:, None]], axis=1
        )
    else:
        dets = jnp.concatenate([out_boxes, out_scores[:, None]], axis=1)
    dets = jnp.where(det_valid[:, None], dets, 0.0)

    if max_per_img > cap:  # pad (static) to the requested shape
        pad = max_per_img - cap
        dets = jnp.pad(dets, ((0, pad), (0, 0)))
        out_labels = jnp.pad(out_labels, (0, pad))
        det_valid = jnp.pad(det_valid, (0, pad))
    return dets, out_labels, det_valid


def multiclass_rnms_batch(
    bboxes: jnp.ndarray,
    scores: jnp.ndarray,
    score_thr: float,
    iou_thr: float,
    max_per_img: int,
    reppoints: jnp.ndarray | None = None,
    pre_nms_cap: int = 4096,
):
    """Batched multiclass rotated NMS: one kernel launch + one suppression
    scan for the whole image batch (vs lax.map serialization).

    bboxes (B, N, 8), scores (B, N, C+1), reppoints (B, N, 18) optional.
    Returns dets (B, max_per_img, 9|27), labels (B, max_per_img),
    valid (B, max_per_img).
    """
    from .pallas_quad_iou import quad_iou_matrix_batch_pallas

    b, n, _ = bboxes.shape
    num_classes = scores.shape[2] - 1
    cls_scores = scores[:, :, 1:]

    flat_scores = cls_scores.reshape(b, -1)  # (B, N*C)
    flat_labels = jnp.tile(jnp.arange(num_classes, dtype=jnp.int32), (n,))
    flat_box_idx = jnp.repeat(jnp.arange(n, dtype=jnp.int32), num_classes)
    cand_ok = flat_scores > score_thr

    cap = min(pre_nms_cap, n * num_classes)
    top_scores, top_idx = jax.lax.top_k(
        jnp.where(cand_ok, flat_scores, _NEG), cap
    )  # (B, cap)
    top_valid = top_scores > score_thr
    top_labels = flat_labels[top_idx]  # (B, cap)
    gather = lambda arr, idx: jnp.take_along_axis(arr, idx[..., None], axis=1)
    top_boxes = gather(bboxes, flat_box_idx[top_idx].reshape(b, cap))

    max_coord = jnp.max(
        jnp.where(top_valid[..., None], top_boxes, 0.0), axis=(1, 2),
        keepdims=True,
    )
    offsets = top_labels.astype(top_boxes.dtype)[..., None] * (max_coord + 1.0)
    boxes_for_nms = top_boxes + offsets

    # rows already score-sorted by top_k; batched pairwise IoU
    iou = quad_iou_matrix_batch_pallas(boxes_for_nms, boxes_for_nms)
    over = iou > iou_thr  # (B, cap, cap)

    def body(i, suppressed):
        keep_i = top_valid[:, i] & ~suppressed[:, i]  # (B,)
        row = over[:, i, :] & (jnp.arange(cap) > i)[None, :]
        return suppressed | (keep_i[:, None] & row)

    suppressed = jax.lax.fori_loop(
        0, cap, body, jnp.zeros((b, cap), dtype=bool)
    )
    keep = top_valid & ~suppressed

    k_out = min(max_per_img, cap)
    out_scores, out_rank = jax.lax.top_k(
        jnp.where(keep, top_scores, _NEG), k_out
    )
    det_valid = out_scores > score_thr
    out_boxes = gather(top_boxes, out_rank)
    out_labels = jnp.where(
        det_valid, jnp.take_along_axis(top_labels, out_rank, axis=1), 0
    )
    if reppoints is not None:
        top_pts = gather(reppoints, flat_box_idx[top_idx].reshape(b, cap))
        out_pts = gather(top_pts, out_rank)
        dets = jnp.concatenate(
            [out_pts, out_boxes, out_scores[..., None]], axis=2
        )
    else:
        dets = jnp.concatenate([out_boxes, out_scores[..., None]], axis=2)
    dets = jnp.where(det_valid[..., None], dets, 0.0)
    if max_per_img > cap:
        pad = max_per_img - cap
        dets = jnp.pad(dets, ((0, 0), (0, pad), (0, 0)))
        out_labels = jnp.pad(out_labels, ((0, 0), (0, pad)))
        det_valid = jnp.pad(det_valid, ((0, 0), (0, pad)))
    return dets, out_labels, det_valid
