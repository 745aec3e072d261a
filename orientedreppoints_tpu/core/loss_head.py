"""End-to-end training loss for OrientedRepPoints (batched, fixed shapes).

This is the TPU-native equivalent of the reference head.loss()
(mmdet/models/anchor_heads/orientedreppoints_head.py:320-493):

  1. decode init/refine offsets to image-coordinate point sets;
  2. init-stage targets via PointAssigner;
  3. refine-stage targets via convex MaxIoUAssigner over the detached
     init-stage point sets (:371-381);
  4. APAA quality assessment + sample selection under stop_gradient
     (:415-430), with positives compacted to a fixed MAX_POS set;
  5. losses: focal cls (avg by selected positive count), convex GIoU refine
     loss over selected positives normalized by point_base_scale*stride,
     spatial border refine loss, and per-level init GIoU + border losses
     over the init assignment (:437-493).

Batch layout: gt_polys (B, G, 8), gt_labels (B, G) 1-based, gt_valid (B, G),
img_hw (B, 2) true sizes inside the padded canvas.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.deform_conv import bilinear_gather
from . import points as P
from .apaa import (
    PosCandidates,
    compact_positives,
    quality_assessment,
    sample_selection,
)
from .losses import focal_loss, giou_loss, spatial_border_loss
from .targets import init_targets_single, refine_targets_single


@dataclasses.dataclass(frozen=True)
class LossConfig:
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    point_base_scale: float = 2.0  # config :37 (head default 4, config 2)
    num_points: int = 9
    max_pos: int = 1024  # fixed cap on positive candidates per image
    top_ratio: float = 0.4
    per_level_topk: int = 6
    # init assigner (config :47)
    init_assign_scale: float = 4.0
    init_assign_pos_num: int = 1
    # refine assigner (config :53-57)
    pos_iou_thr: float = 0.1
    neg_iou_thr: float = 0.1
    min_pos_iou: float = 0.0
    # losses (config :39-42)
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_cls_weight: float = 1.0
    loss_rbox_init_weight: float = 0.375
    loss_rbox_refine_weight: float = 1.0
    loss_spatial_init_weight: float = 0.05
    loss_spatial_refine_weight: float = 0.1


def _concat_levels_nhwc(maps, channels):
    """[(B,H,W,C)] -> (B, sum HW, C)."""
    return jnp.concatenate(
        [m.reshape(m.shape[0], -1, channels) for m in maps], axis=1
    )


def _level_layout(img_size, cfg):
    shapes = P.level_shapes(img_size, cfg.strides)
    sizes = [h * w for h, w in shapes]
    level_ids = np.concatenate(
        [np.full(s, i, np.int32) for i, s in enumerate(sizes)]
    )
    strides = np.concatenate(
        [np.full(s, cfg.strides[i], np.float32) for i, s in enumerate(sizes)]
    )
    bounds = np.cumsum([0] + sizes)
    return shapes, sizes, level_ids, strides, bounds


def sample_point_features(base_feats, pts, level_ids_cand, strides_cfg):
    """Bilinearly sample per-point features at refine point locations.

    base_feats: list of (B, H_l, W_l, C) raw FPN maps.
    pts: (B, P, 18) candidate point sets in image coords.
    level_ids_cand: (B, P) level id per candidate.
    Returns (B, P, 9, C).

    grid_sample parity (head :495-520, align_corners=False): sample at
    feature coords loc/stride - 0.5 with zero padding.
    """
    b, p, _ = pts.shape
    xy = pts.reshape(b, p, 9, 2)
    out = None
    for lvl, feat in enumerate(base_feats):
        s = float(strides_cfg[lvl])
        px = xy[..., 0] / s - 0.5  # (B,P,9)
        py = xy[..., 1] / s - 0.5
        samp = bilinear_gather(feat.astype(jnp.float32), py, px)  # (B,P,9,C)
        sel = (level_ids_cand == lvl)[..., None, None]
        out = samp * sel if out is None else out + samp * sel
    return out


def compute_losses(outs, gt_polys, gt_labels, gt_valid, img_hw, cfg: LossConfig):
    """Full training loss dict.

    outs: detector head outputs (per-level lists, NHWC).
    Returns dict of scalar losses (loss_rbox_init / loss_spatial_init are
    already summed over levels, like the reference's parse_losses sum).
    """
    cls_maps = outs["cls_scores"]
    num_classes = cls_maps[0].shape[-1]
    b = cls_maps[0].shape[0]
    img_size = (
        cls_maps[0].shape[1] * cfg.strides[0],
        cls_maps[0].shape[2] * cfg.strides[0],
    )
    shapes, sizes, level_ids_np, strides_np, bounds = _level_layout(
        img_size, cfg
    )
    level_ids = jnp.asarray(level_ids_np)
    stride_per_pt = jnp.asarray(strides_np)
    n = int(bounds[-1])

    # ---- decode predictions ------------------------------------------------
    cls_scores = _concat_levels_nhwc(
        [m.astype(jnp.float32) for m in cls_maps], num_classes
    )  # (B,N,C)
    pts_init = jnp.concatenate(
        [
            P.offset_to_pts(outs["pts_init"][l].astype(jnp.float32), s)
            for l, s in enumerate(cfg.strides)
        ],
        axis=1,
    )  # (B,N,18)
    pts_refine = jnp.concatenate(
        [
            P.offset_to_pts(outs["pts_refine"][l].astype(jnp.float32), s)
            for l, s in enumerate(cfg.strides)
        ],
        axis=1,
    )

    # ---- valid flags -------------------------------------------------------
    grid = jnp.concatenate(
        [P.grid_points(h, w, s) for (h, w), s in zip(shapes, cfg.strides)],
        axis=0,
    )  # (N,3)

    def one_valid(hw):
        return jnp.concatenate(
            P.multi_level_valid_flags(img_size, cfg.strides, hw)
        )

    points_valid = jax.vmap(one_valid)(img_hw)  # (B,N)

    # ---- init targets ------------------------------------------------------
    init_tg = jax.vmap(
        lambda pv, gp, gv, gl: init_targets_single(
            grid, pv, gp, gv, gl,
            scale=cfg.init_assign_scale, pos_num=cfg.init_assign_pos_num,
        )
    )(points_valid, gt_polys, gt_valid, gt_labels)

    # ---- refine targets (proposals = detached init points) -----------------
    proposals = jax.lax.stop_gradient(pts_init)
    refine_tg = jax.vmap(
        lambda pr, pv, gp, gv, gl: refine_targets_single(
            pr, pv, gp, gv, gl,
            pos_iou_thr=cfg.pos_iou_thr, neg_iou_thr=cfg.neg_iou_thr,
            min_pos_iou=cfg.min_pos_iou,
        )
    )(proposals, points_valid, gt_polys, gt_valid, gt_labels)

    # Fence off the assigner region: without this barrier the TPU compiler
    # fuses the refine-assign (Pallas hull IoU + Jarvis scans) with the APAA
    # geometry below and crashes in fusion_emitter (negative window padding).
    refine_tg = jax.tree.map(jax.lax.optimization_barrier, refine_tg)

    # ---- APAA (no-grad region, head :415) -----------------------------------
    sg = jax.lax.stop_gradient
    cand = jax.vmap(
        lambda gi: compact_positives(gi, level_ids, cfg.max_pos)
    )(refine_tg.gt_inds)

    cand_pts_refine = jnp.take_along_axis(
        sg(pts_refine), cand.idx[..., None], axis=1
    )  # (B,P,18)
    pts_feats = sample_point_features(
        [sg(f) for f in outs["base_feats"]],
        cand_pts_refine, cand.level, cfg.strides,
    )  # (B,P,9,C)

    quality = jax.vmap(
        lambda c, cs, pi, pr, lb, tp, pf: quality_assessment(
            c, cs, pi, pr, lb, tp, pf,
            gamma=cfg.focal_gamma, alpha=cfg.focal_alpha,
        )
    )(
        cand, sg(cls_scores), sg(pts_init), sg(pts_refine),
        refine_tg.labels, refine_tg.gt_polys, pts_feats,
    )  # (B,P)

    max_gt = gt_polys.shape[1]
    keep = jax.vmap(
        lambda c, q: sample_selection(
            c, q, max_gt, len(cfg.strides),
            per_level_topk=cfg.per_level_topk, top_ratio=cfg.top_ratio,
        )
    )(cand, quality)  # (B,P)

    num_pos = jnp.sum(keep)

    # positives beyond the max_pos candidate cap never reach APAA and are
    # demoted to background below; surface the overflow so dense scenes
    # (small-vehicle tiles can exceed 1k refine positives) are visible in
    # training logs instead of silently losing supervision
    pos_per_img = jnp.sum(refine_tg.gt_inds > 0, axis=1)  # (B,)
    overflow_pos = jnp.sum(jnp.maximum(pos_per_img - cfg.max_pos, 0))

    # ---- demotion: unselected positives become background -------------------
    # scatter keep back to the full point set (cand.idx is a slice of a
    # permutation, so indices are unique per image and .set is safe)
    sel_full = jnp.zeros((b, n), dtype=bool)
    sel_full = jax.vmap(lambda s, i, k: s.at[i].set(k))(
        sel_full, cand.idx, keep
    )
    was_pos = refine_tg.gt_inds > 0
    labels_final = jnp.where(
        was_pos & ~sel_full, 0, refine_tg.labels
    )  # (B,N)

    # ---- classification loss -------------------------------------------------
    loss_cls = focal_loss(
        cls_scores, labels_final, refine_tg.label_weights,
        avg_factor=num_pos,
        gamma=cfg.focal_gamma, alpha=cfg.focal_alpha,
        loss_weight=cfg.loss_cls_weight,
    ) * (num_pos > 0)

    # ---- refine rbox + border losses over selected candidates ---------------
    norm_cand = cfg.point_base_scale * jnp.take_along_axis(
        stride_per_pt[None, :].repeat(b, 0), cand.idx, axis=1
    )  # (B,P)
    pred_refine_cand = jnp.take_along_axis(
        pts_refine, cand.idx[..., None], axis=1
    )
    gt_cand = jnp.take_along_axis(
        refine_tg.gt_polys, cand.idx[..., None], axis=1
    )
    w_keep = keep.astype(jnp.float32)
    nrm = norm_cand[..., None]
    loss_rbox_refine = giou_loss(
        (pred_refine_cand / nrm).reshape(-1, 2 * cfg.num_points),
        (gt_cand / nrm).reshape(-1, 8),
        w_keep.reshape(-1),
        divisor=num_pos,
        loss_weight=cfg.loss_rbox_refine_weight,
    ) * (num_pos > 0)
    loss_spatial_refine = spatial_border_loss(
        (pred_refine_cand / nrm).reshape(-1, 2 * cfg.num_points),
        (gt_cand / nrm).reshape(-1, 8),
        w_keep.reshape(-1),
        loss_weight=cfg.loss_spatial_refine_weight,
    ) * (num_pos > 0)

    # ---- init losses per level (head init_loss_single :294-318) -------------
    # compact to max_gt * pos_num candidates per level first: the
    # PointAssigner puts at most pos_num positives per gt, so top-k on the
    # weight row captures every positive while shrinking the autodiffed
    # convex-GIoU graph from B x N_level rows to B x (max_gt * pos_num)
    # (the refine path already compacts the same way via compact_positives)
    loss_rbox_init = 0.0
    loss_spatial_init = 0.0
    for lvl, s in enumerate(cfg.strides):
        lo, hi = int(bounds[lvl]), int(bounds[lvl + 1])
        norm = cfg.point_base_scale * float(s)
        k = min(max_gt * cfg.init_assign_pos_num, hi - lo)
        w_top, top_idx = jax.lax.top_k(init_tg.pos_weights[:, lo:hi], k)
        pred = jnp.take_along_axis(
            pts_init[:, lo:hi], top_idx[..., None], axis=1
        )
        gt = jnp.take_along_axis(
            init_tg.gt_polys[:, lo:hi], top_idx[..., None], axis=1
        )
        pred = (pred / norm).reshape(-1, 2 * cfg.num_points)
        gt = (gt / norm).reshape(-1, 8)
        w = w_top.reshape(-1)
        n_lvl = jnp.sum(w > 0)
        loss_rbox_init += giou_loss(
            pred, gt, w, divisor=n_lvl,
            loss_weight=cfg.loss_rbox_init_weight,
        ) * (n_lvl > 0)
        loss_spatial_init += spatial_border_loss(
            pred, gt, w, loss_weight=cfg.loss_spatial_init_weight,
        ) * (n_lvl > 0)

    return {
        "loss_cls": loss_cls,
        "loss_rbox_init": loss_rbox_init,
        "loss_rbox_refine": loss_rbox_refine,
        "loss_spatial_init": loss_spatial_init,
        "loss_spatial_refine": loss_spatial_refine,
        "num_pos": num_pos.astype(jnp.float32),
        "num_assigned_pos": jnp.sum(pos_per_img).astype(jnp.float32),
        "overflow_pos": overflow_pos.astype(jnp.float32),
    }
