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

import os

import jax
import jax.numpy as jnp

from .geometry import quad_iou_matrix

_NEG = -1e9
# suppression-scan block (rows unrolled per fori_loop step).  128 is the
# TPU dispatch/compute sweet spot; the CPU test suite sets ORP_SCAN_BLK=32
# because XLA:CPU compile time of the unrolled block dominates suite wall
# time (results are blk-independent — see TestBlockedScan).
_SCAN_BLK = int(os.environ.get("ORP_SCAN_BLK", "128"))


def greedy_scan_sorted(over: jnp.ndarray, valid: jnp.ndarray,
                       blk: int = _SCAN_BLK,
                       num_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Greedy NMS suppression scan over score-sorted rows, blocked.

    over: (N, N) or (B, N, N) bool — over[i, j] means row i suppresses
      row j; only entries with j > i are read.
    valid: (N,) or (B, N) bool.
    num_valid: optional per-image valid-prefix lengths ((B,) or scalar);
      rows are score-sorted so valid rows form a prefix — the outer loop
      then runs ceil(max(num_valid)/blk) iterations instead of N/blk
      (dynamic fori_loop bound), making sparse scenes nearly free.
    Returns keep — same shape as valid, in the sorted order.

    The naive formulation is a fori_loop of N dependent steps, each a
    dynamic-slice + tiny vector op — ~N kernel dispatches dominate
    (measured ~20 ms at N=4096 on v5e).  Here the scan runs in blocks of
    `blk` rows: each outer step slices the block's rows once and unrolls
    `blk` statically-indexed steps that XLA fuses into a handful of
    kernels, cutting dispatches ~blk-fold with bit-identical results
    (within-block suppression is tracked in a local vector before being
    merged into the global one).
    """
    squeeze = over.ndim == 2
    if squeeze:
        over = over[None]
        valid = valid[None]
    b, n, _ = over.shape
    npad = (-n) % blk
    if npad:
        over = jnp.pad(over, ((0, 0), (0, npad), (0, npad)))
        valid = jnp.pad(valid, ((0, 0), (0, npad)))
    np_ = n + npad
    col = jnp.arange(np_)
    blk_col = jnp.arange(blk)

    def outer(bi, suppressed):
        base = bi * blk
        vblk = jax.lax.dynamic_slice_in_dim(valid, base, blk, axis=1)
        rows = jax.lax.dynamic_slice_in_dim(over, base, blk, axis=1)
        diag = jax.lax.dynamic_slice_in_dim(rows, base, blk, axis=2)
        sup_blk = jax.lax.dynamic_slice_in_dim(suppressed, base, blk, axis=1)
        rel = (col - base)[None, :]  # (1, Np)
        acc = jnp.zeros_like(suppressed)
        for r in range(blk):
            keep_i = vblk[:, r] & ~sup_blk[:, r]  # (B,)
            acc = acc | (keep_i[:, None] & rows[:, r] & (rel > r))
            sup_blk = sup_blk | (
                keep_i[:, None] & diag[:, r] & (blk_col > r)[None, :]
            )
        return suppressed | acc

    n_blocks = np_ // blk
    if num_valid is not None:
        # rows beyond the valid prefix never suppress anything (keep_i
        # requires valid), so stopping at the last valid block is exact
        nv_max = jnp.max(jnp.asarray(num_valid))
        n_blocks = jnp.minimum((nv_max + blk - 1) // blk, n_blocks)
    suppressed = jax.lax.fori_loop(
        0, n_blocks, outer, jnp.zeros((b, np_), dtype=bool)
    )
    keep = valid & ~suppressed
    keep = keep[:, :n]
    return keep[0] if squeeze else keep


def compact_keep_sorted(keep: jnp.ndarray, scores: jnp.ndarray, k_out: int):
    """Select the first k_out kept rows of a score-DESCENDING candidate
    list without a top_k.

    XLA's top_k at k≈2000 lowers to a full variadic sort whose bitonic
    passes are dispatch-bound (~4 ms at (4, 4096) on v5e) — but the NMS
    candidates are already score-sorted, so the kept subset in row order
    IS the top-k: a cumsum + vectorized binary search (searchsorted) finds
    the j-th kept row in ~log2(N) tiny gathers instead.

    keep/scores: (B, N).  Returns (out_scores, out_rank, det_valid), each
    (B, k_out); out_scores is 0 where invalid.
    """
    b, n = keep.shape
    # prefix sum by log-doubling shifts: jnp.cumsum lowers to reduce-window
    # and alone cost ~3.5 ms at (4, 4096) on v5e
    kcum = keep.astype(jnp.int32)
    shift = 1
    while shift < n:
        kcum = kcum + jnp.pad(kcum[:, :-shift], ((0, 0), (shift, 0)))
        shift *= 2
    total = kcum[:, -1]
    targets = jnp.arange(1, k_out + 1, dtype=jnp.int32)
    # smallest i with kcum[i] == j+1  ==  #{i : kcum[i] < j+1}; the brute
    # count fuses into one compare+reduce pass over the minor axis
    # (vmapped searchsorted dispatches a gather per binary-search step and
    # measured slower than the top_k it replaces; reducing the minor axis
    # is ~2x faster than the middle axis)
    out_rank = jnp.sum(
        (kcum[:, None, :] < targets[None, :, None]).astype(jnp.int32),
        axis=2,
    )
    det_valid = targets[None, :] <= total[:, None]
    out_rank = jnp.minimum(out_rank, n - 1)
    out_scores = jnp.where(
        det_valid, jnp.take_along_axis(scores, out_rank, axis=1), 0.0
    )
    return out_scores, out_rank, det_valid


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
      iou_thr: suppression threshold (exact polygon IoU).  Must be a
        static Python float — it is baked into the fused Pallas over-mask
        kernel at trace time; a traced/array threshold raises.
      valid: optional (N,) bool; invalid rows are never kept.

    Returns:
      keep: (N,) bool mask in the ORIGINAL order.
    """
    from .pallas_quad_iou import quad_over_matrix_pallas

    n = quads.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    order = jnp.argsort(jnp.where(valid, scores, _NEG))[::-1]
    squads = quads[order]
    svalid = valid[order]
    # fused Pallas over-mask kernel: computes int8 (IoU > thr) directly,
    # upper-triangle tiles only (the blocked scan reads col > row), tiles
    # beyond the score-sorted valid prefix skipped; the scan's trip count
    # is likewise bounded by the candidate count
    nv = jnp.sum(svalid.astype(jnp.int32))
    over = quad_over_matrix_pallas(squads, float(iou_thr), num_valid=nv)
    keep_sorted = greedy_scan_sorted(over, svalid, num_valid=nv)
    keep = jnp.zeros((n,), dtype=bool).at[order].set(keep_sorted)
    return keep


def hbb_iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise horizontal-box IoU. a: (N, 4), b: (M, 4) x1y1x2y2."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, min=0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def hbb_iou_matrix_legacy(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise horizontal-box IoU in the reference CPU kernels' legacy
    integer-pixel convention: width/height/areas computed with +1
    (mmdet/ops/nms/src/nms_cpu.cpp:19,52-53).  Only the nms_hbb /
    soft_nms_hbb parity paths use this; everything else uses the
    continuous-coordinate `hbb_iou_matrix`."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt + 1.0, min=0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0] + 1.0) * (a[:, 3] - a[:, 1] + 1.0)
    area_b = (b[:, 2] - b[:, 0] + 1.0) * (b[:, 3] - b[:, 1] + 1.0)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def _greedy_suppress(iou, scores, iou_thr, valid, inclusive: bool = False):
    """Shared greedy scan over a precomputed pairwise IoU matrix.

    inclusive=True suppresses at IoU >= thr (the reference horizontal
    nms_cpu.cpp:56 convention); the rotated kernels use strict >
    (rnms_cpu.cpp:277, rnms_kernel.cu).
    Returns keep (N,) bool in the ORIGINAL order.
    """
    n = scores.shape[0]
    order = jnp.argsort(jnp.where(valid, scores, _NEG))[::-1]
    siou = iou[order][:, order]
    svalid = valid[order]
    over = (siou >= iou_thr) if inclusive else (siou > iou_thr)
    keep_sorted = greedy_scan_sorted(over, svalid)
    return jnp.zeros((n,), dtype=bool).at[order].set(keep_sorted)


def nms_hbb(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_thr: float,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Greedy horizontal NMS on device (reference nms_wrapper.py:7-60's
    nms() entry -> nms_cpu.cpp kernel, fixed-shape TPU formulation):
    legacy +1 pixel areas and inclusive (IoU >= thr) suppression, matching
    nms_cpu.cpp:19,56 exactly.  Returns keep mask in the original order.
    """
    if valid is None:
        valid = jnp.ones((boxes.shape[0],), dtype=bool)
    return _greedy_suppress(hbb_iou_matrix_legacy(boxes, boxes), scores,
                            iou_thr, valid, inclusive=True)


def _soft_suppress(
    iou, scores, valid, method: str, sigma: float, iou_thr: float,
    min_score: float, max_keep: int | None = None,
):
    """Soft-NMS decay loop over a precomputed IoU matrix.

    Reference soft_nms semantics (nms_wrapper.py:120-175 -> cpu_soft_nms):
    iteratively take the current max-score box; decay every remaining
    box's score — linear: s *= 1-iou (iou > thr), gaussian:
    s *= exp(-iou^2/sigma). Returns (decayed_scores, keep) where keep =
    selected with decayed score > min_score.

    Runs as a while_loop that exits as soon as the best remaining decayed
    score drops to min_score (every later pick would also fail the test,
    so the kept set is EXACT) — the sequential trip count scales with the
    number of selections instead of the static candidate cap (a 4096-cap
    scene with 100 real detections runs ~100 trips, not 4096).  max_keep
    optionally bounds selections (pass max_per_img when the caller
    truncates anyway).
    """
    n = scores.shape[0]
    use_linear = method == "linear"
    cap = n if max_keep is None else min(n, int(max_keep))

    def best(cur, processed):
        masked = jnp.where(processed | ~valid, _NEG, cur)
        j = jnp.argmax(masked)
        return j, masked[j]

    def cond(state):
        cur, processed, _, cnt = state
        _, s = best(cur, processed)
        return (s > min_score) & (cnt < cap)

    def body(state):
        cur, processed, kept, cnt = state
        j, _ = best(cur, processed)  # cond guarantees score > min_score
        processed = processed.at[j].set(True)
        kept = kept.at[j].set(True)
        iou_j = iou[j]
        if use_linear:
            decay = jnp.where(iou_j > iou_thr, 1.0 - iou_j, 1.0)
        else:
            decay = jnp.exp(-(iou_j * iou_j) / sigma)
        decay = jnp.where(processed, 1.0, decay)
        return cur * decay, processed, kept, cnt + 1

    init = (scores, jnp.zeros((n,), bool), jnp.zeros((n,), bool),
            jnp.zeros((), jnp.int32))
    cur, _, kept, _ = jax.lax.while_loop(cond, body, init)
    return cur, kept


def soft_rnms(
    quads: jnp.ndarray,
    scores: jnp.ndarray,
    iou_thr: float = 0.3,
    sigma: float = 0.5,
    min_score: float = 1e-3,
    method: str = "gaussian",
    valid: jnp.ndarray | None = None,
    max_keep: int | None = None,
):
    """Soft-NMS over rotated polygons, fully on device (the reference has
    soft NMS only for horizontal boxes on CPU, nms_wrapper.py:120-175; this
    extends it to the oriented path with exact polygon IoU).

    Returns (decayed_scores (N,), keep (N,) bool) in the original order.
    """
    from .pallas_quad_iou import quad_iou_matrix_pallas

    if valid is None:
        valid = jnp.ones((quads.shape[0],), dtype=bool)
    iou = quad_iou_matrix_pallas(quads, quads)
    return _soft_suppress(iou, scores, valid, method, sigma, iou_thr,
                          min_score, max_keep)


def soft_nms_hbb(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_thr: float = 0.3,
    sigma: float = 0.5,
    min_score: float = 1e-3,
    method: str = "linear",
    valid: jnp.ndarray | None = None,
    max_keep: int | None = None,
):
    """Horizontal soft-NMS on device (reference soft_nms entry,
    nms_wrapper.py:63-118 -> nms_cpu.cpp soft_nms kernel; defaults mirror
    it: method='linear', iou_thr=0.3, sigma=0.5, min_score=1e-3).  Uses
    the kernel's legacy +1 pixel-area IoU (nms_cpu.cpp:85,153-156).

    Returns (decayed_scores (N,), keep (N,) bool).
    """
    if valid is None:
        valid = jnp.ones((boxes.shape[0],), dtype=bool)
    iou = hbb_iou_matrix_legacy(boxes, boxes)
    return _soft_suppress(iou, scores, valid, method, sigma, iou_thr,
                          min_score, max_keep)


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
      iou_thr: rotated NMS IoU threshold.  Static Python float only (see
        rotated_nms_mask — the threshold is fused into the Pallas kernel).
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

    # rows from top_k are already score-sorted: run the over-mask kernel +
    # scan directly (no re-sort), then compact kept rows without a top_k
    from .pallas_quad_iou import quad_over_matrix_pallas

    nv = jnp.sum(top_valid.astype(jnp.int32))
    over = quad_over_matrix_pallas(boxes_for_nms, float(iou_thr),
                                   num_valid=nv)
    keep = greedy_scan_sorted(over, top_valid, num_valid=nv)

    out_scores, out_rank, det_valid = compact_keep_sorted(
        keep[None], top_scores[None], min(max_per_img, cap)
    )
    out_scores, out_rank, det_valid = (
        out_scores[0], out_rank[0], det_valid[0]
    )
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
    from .pallas_quad_iou import quad_over_matrix_batch_pallas

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

    # rows already score-sorted by top_k; fused over-mask kernel (int8
    # IoU > thr, upper-triangle tiles, per-image valid-prefix skip) + scan
    # with its trip count bounded by the real candidate count
    nv = jnp.sum(top_valid.astype(jnp.int32), axis=1)
    over = quad_over_matrix_batch_pallas(
        boxes_for_nms, float(iou_thr), num_valid=nv,
    )
    keep = greedy_scan_sorted(over, top_valid, num_valid=nv)

    k_out = min(max_per_img, cap)
    out_scores, out_rank, det_valid = compact_keep_sorted(
        keep, top_scores, k_out
    )
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
