"""APAA: adaptive points assessment and assignment (single image).

Re-implements the reference's quality assessment + sample selection
(mmdet/models/anchor_heads/orientedreppoints_head.py:495-671) as fixed-shape
masked tensor ops:

  * quality Q per positive = L_cls.sum + 0.2*(L_loc_init + 0.3*L_ori_init)
    + 0.8*(L_loc_refine + 0.3*L_ori_refine) + 0.1*feat_dissimilarity
    (:522-573, weights at :570-571);
  * orientation term = chamfer distance between 10-per-edge samplings of the
    gt quad and of minAreaRect(predicted points) (:250-292, :543-552);
  * feature dissimilarity = max over the 9 points of (1 - cos similarity to
    the mean point feature), features bilinearly sampled at refine point
    locations (:576-600, grid_sample :495-520 with align_corners=False =>
    sample at loc/stride - 0.5);
  * selection (:602-671): per (gt, level) top-6 lowest-Q positives, pooled
    across levels, sorted, keep ceil(top_ratio * n) (all if n < 2); the
    rest are demoted to background.  The per-gt python loops become
    (G, L, P)-masked top_k/sort ops.

Positives are compacted to a fixed MAX_POS candidate set before the heavy
geometry so cost scales with the cap, not with all ~22k grid points.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..ops.geometry import chamfer_distance_2d, convex_giou, min_area_rect
from .losses import sigmoid_focal_loss_elementwise

_INF = jnp.inf


def sample_edge_points(quads: jnp.ndarray, points_per_edge: int = 10):
    """(M, 8) quads -> (M, 4*points_per_edge, 2) uniform edge samplings.

    Mirrors head.sampling_points (:250-292): per edge, linspace(0, 1, n)
    interpolation from corner i to corner i+1 (wrapping).
    """
    m = quads.shape[0]
    q = quads.reshape(m, 4, 2)
    t = jnp.linspace(0.0, 1.0, points_per_edge)[None, None, :, None]
    starts = q[:, :, None, :]  # (M,4,1,2)
    ends = jnp.roll(q, -1, axis=1)[:, :, None, :]
    pts = (1 - t) * starts + t * ends  # (M,4,n,2)
    return pts.reshape(m, 4 * points_per_edge, 2)


class PosCandidates(NamedTuple):
    idx: jnp.ndarray  # (P,) global point indices (into the N grid points)
    mask: jnp.ndarray  # (P,) bool
    gt_idx: jnp.ndarray  # (P,) 0-based gt index
    level: jnp.ndarray  # (P,) level id


def compact_positives(gt_inds, level_ids, max_pos: int) -> PosCandidates:
    """Gather up to max_pos positive points into a fixed-size candidate set.

    When the positives exceed max_pos, the survivors are an UNBIASED
    fixed pseudo-random subset (Knuth multiplicative hash of the global
    index as the drop priority), NOT the raster prefix: a prefix cap
    systematically drops every coarse-level positive (large objects —
    levels order after the stride-8 plane in the flat layout) and the
    bottom rows of the fine level whenever a dense 1024^2 mosaic sample
    overflows, silently starving those gts of refine supervision.  The
    surviving subset is re-sorted to global-index order so downstream
    tie-breaking (stable argsorts in sample_selection) matches the
    reference's index ordering exactly when no overflow occurs.
    """
    pos = gt_inds > 0
    arange = jnp.arange(gt_inds.shape[0], dtype=jnp.uint32)
    # Knuth multiplicative hash (uint32 wraparound) as the fixed priority
    prio = (arange * jnp.uint32(2654435761)) & jnp.uint32(0x7FFFFFFF)
    score = jnp.where(pos, prio, jnp.uint32(0xFFFFFFFF))
    sel = jnp.argsort(score)[:max_pos]
    # restore the reference's global-index ordering among survivors
    idx = jnp.sort(sel)
    mask = pos[idx]
    return PosCandidates(
        idx=idx.astype(jnp.int32),
        mask=mask,
        gt_idx=jnp.maximum(gt_inds[idx] - 1, 0).astype(jnp.int32),
        level=level_ids[idx].astype(jnp.int32),
    )


def feature_dissimilarity(pts_features: jnp.ndarray) -> jnp.ndarray:
    """Point-feature dissimilarity term (feature_cosine_similarity,
    orientedreppoints_head.py:576-600): max over the 9 points of
    (1 - cos similarity to the mean point feature), with the reference's
    1e-2 norm clamp and the CosineSimilarity 1e-6 denominator floor
    applied to the re-normalized vectors.

    pts_features: (P, 9, C) sampled refine-point features -> (P,) f32.
    """
    feats = pts_features.astype(jnp.float32)  # (P, 9, C)
    mean_f = jnp.mean(feats, axis=1, keepdims=True)
    norm_f = jnp.clip(jnp.linalg.norm(feats, axis=2, keepdims=True), min=1e-2)
    norm_m = jnp.clip(jnp.linalg.norm(mean_f, axis=2, keepdims=True), min=1e-2)
    u = feats / norm_f
    um = mean_f / norm_m
    # torch CosineSimilarity on the re-normalized vectors (norms ~1)
    dot = jnp.sum(u * um, axis=2)
    denom = jnp.maximum(
        jnp.linalg.norm(u, axis=2) * jnp.linalg.norm(um, axis=2), 1e-6
    )
    dissim = 1.0 - dot / denom  # (P, 9)
    return jnp.max(dissim, axis=1)


def quality_assessment(
    cand: PosCandidates,
    cls_scores,  # (N, C) logits
    pts_init,  # (N, 18) image coords
    pts_refine,  # (N, 18) image coords
    labels,  # (N,) refine-stage labels
    target_polys,  # (N, 8)
    pts_features,  # (P, 9, C) sampled refine-point features (pre-gathered)
    gamma: float = 2.0,
    alpha: float = 0.25,
):
    """Per-candidate quality Q (lower = better), +inf for masked slots."""
    p_idx = cand.idx
    scores = cls_scores[p_idx]
    lab = labels[p_idx]
    qua_cls = jnp.sum(
        sigmoid_focal_loss_elementwise(scores, lab, gamma, alpha), axis=-1
    )

    init_p = pts_init[p_idx]
    refine_p = pts_refine[p_idx]
    gt_q = target_polys[p_idx]

    corners_init = min_area_rect(init_p)
    corners_refine = min_area_rect(refine_p)
    samp_init = sample_edge_points(corners_init)
    samp_refine = sample_edge_points(corners_refine)
    samp_gt = sample_edge_points(gt_q)
    qua_ori_init = chamfer_distance_2d(samp_gt, samp_init)
    qua_ori_refine = chamfer_distance_2d(samp_gt, samp_refine)

    qua_loc_init = 1.0 - convex_giou(init_p, gt_q)
    qua_loc_refine = 1.0 - convex_giou(refine_p, gt_q)

    feat_q = feature_dissimilarity(pts_features)

    q = (
        qua_cls
        + 0.2 * (qua_loc_init + 0.3 * qua_ori_init)
        + 0.8 * (qua_loc_refine + 0.3 * qua_ori_refine)
        + 0.1 * feat_q
    )
    return jnp.where(cand.mask, q, _INF)


def sample_selection(
    cand: PosCandidates,
    quality: jnp.ndarray,  # (P,)
    num_gt: int,
    num_levels: int,
    per_level_topk: int = 6,
    top_ratio: float = 0.4,
):
    """Select final positives: per-(gt, level) top-k lowest Q, pooled per gt,
    keep ceil(top_ratio * n) (all when n < 2).

    Returns keep: (P,) bool over the candidate slots.
    """
    p = quality.shape[0]
    # (G, L, P) masked quality
    gt_onehot = cand.gt_idx[None, :] == jnp.arange(num_gt)[:, None]  # (G, P)
    lvl_onehot = cand.level[None, :] == jnp.arange(num_levels)[:, None]
    m = gt_onehot[:, None, :] & lvl_onehot[None, :, :] & cand.mask  # (G,L,P)
    qm = jnp.where(m, quality[None, None, :], _INF)

    k = min(per_level_topk, p)
    neg_top, top_idx = jax.lax.top_k(-qm, k)  # (G, L, k) indices into P
    top_q = -neg_top
    top_valid = jnp.isfinite(top_q)

    # pool levels per gt: (G, L*k), sort ascending
    pool_q = top_q.reshape(num_gt, -1)
    pool_idx = top_idx.reshape(num_gt, -1)
    pool_valid = top_valid.reshape(num_gt, -1)
    order = jnp.argsort(jnp.where(pool_valid, pool_q, _INF), axis=1)
    sorted_idx = jnp.take_along_axis(pool_idx, order, axis=1)
    sorted_valid = jnp.take_along_axis(pool_valid, order, axis=1)

    n_g = jnp.sum(sorted_valid, axis=1)  # (G,)
    keep_k = jnp.ceil(top_ratio * n_g).astype(jnp.int32)
    keep_k = jnp.where(n_g < 2, n_g, keep_k)
    rank = jnp.arange(pool_q.shape[1])[None, :]
    keep_slot = (rank < keep_k[:, None]) & sorted_valid  # (G, L*k)

    # top_k emits duplicate/garbage indices in masked slots, so scatter-max
    # an int mask (keep_slot is False there, making them inert)
    keep_i = jnp.zeros((p,), dtype=jnp.int32)
    keep_i = keep_i.at[sorted_idx.reshape(-1)].max(
        keep_slot.reshape(-1).astype(jnp.int32)
    )
    return (keep_i > 0) & cand.mask
