"""Training losses: sigmoid focal, convex GIoU (with the reference's
gradient filter), and the spatial-border penalty.

Reference parity:
  * focal loss — fused CUDA sigmoid focal loss over 15 fg classes with
    integer labels, label 0 = background (mmdet/models/losses/focal_loss.py:
    28-41, mmdet/ops/sigmoid_focal_loss); weight is per-row, avg_factor
    divides the sum (losses/utils.py weight_reduce_loss semantics).
  * convex GIoU loss — loss = 1 - convex_giou; 'mean' divides by the number
    of rows; the backward injects -(grad)/N*loss_weight where rows with any
    gradient component > 1 are replaced by +eps (the `_unvalid_grad_filter`
    in iou_loss.py:69-101).  We reproduce this exactly with jax.custom_vjp
    (including ignoring the upstream cotangent, like the reference Function
    does).
  * spatial border loss — for positive point sets, points falling outside
    their gt quad are penalized by 0.2 * distance to the gt center, averaged
    over outside points, divided by n_pos (spatial_border_loss.py:24-93).

All functions are masked/fixed-shape: `weight` rows with 0 are inert, and
divisors are passed explicitly so batched-masked call sites match the
reference's dynamic-shape reductions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.geometry import convex_giou, points_in_polygon


# ---------------------------------------------------------------------------
# Sigmoid focal loss
# ---------------------------------------------------------------------------


def sigmoid_focal_loss_elementwise(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> jnp.ndarray:
    """Per-(row, class) focal loss with integer labels (0 = background).

    logits: (..., C) for C foreground classes; labels: (...) in [0, C]
    where label c>0 marks foreground class c (1-based).
    """
    num_classes = logits.shape[-1]
    t = jax.nn.one_hot(labels - 1, num_classes, dtype=logits.dtype)
    # labels == 0 -> all-zero target row (one_hot of -1 is zeros)
    p = jax.nn.sigmoid(logits)
    pt = (1 - p) * t + p * (1 - t)
    focal_weight = (alpha * t + (1 - alpha) * (1 - t)) * pt**gamma
    bce = optax_sigmoid_bce(logits, t)
    return bce * focal_weight


def optax_sigmoid_bce(logits, targets):
    """Numerically-stable BCE with logits (same as F.bce_with_logits)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    weight: jnp.ndarray,
    avg_factor,
    gamma: float = 2.0,
    alpha: float = 0.25,
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    """Reduced focal loss: sum(elementwise * row_weight) / avg_factor."""
    loss = sigmoid_focal_loss_elementwise(logits, labels, gamma, alpha)
    loss = loss * weight[..., None]
    return loss_weight * jnp.sum(loss) / jnp.maximum(avg_factor, 1e-6)


# ---------------------------------------------------------------------------
# Convex GIoU loss with the reference gradient filter
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _giou_loss_sum(pred, target, weight, divisor, loss_weight):
    giou = convex_giou(pred, target)
    return jnp.sum((1.0 - giou) * weight) / jnp.maximum(divisor, 1e-6)


def _giou_loss_sum_fwd(pred, target, weight, divisor, loss_weight):
    giou, dgiou_fn = jax.vjp(lambda p: convex_giou(p, target), pred)
    loss = jnp.sum((1.0 - giou) * weight) / jnp.maximum(divisor, 1e-6)
    # d(giou)/d(pred) rows scaled by weight — matches the reference where
    # `grad = grad * weight` before filtering (iou_loss.py:82-83)
    (dgiou,) = dgiou_fn(weight)
    return loss, (dgiou, divisor, loss_weight)


def _giou_loss_sum_bwd(res, g):
    dgiou, divisor, loss_weight = res
    # _unvalid_grad_filter: rows with any component > 1 are replaced by +eps
    # (note: signed >, not abs — parity with iou_loss.py:88-89)
    eps = 1e-6
    bad = jnp.any(dgiou > 1.0, axis=-1, keepdims=True)
    grad = jnp.where(bad, eps, dgiou)
    # _reduce_grad: -grad / N * loss_weight; upstream cotangent is ignored
    # exactly like the reference autograd.Function (iou_loss.py:92-101)
    reduce_grad = -grad / jnp.maximum(divisor, 1e-6) * loss_weight
    return (reduce_grad, None, None, None, None)


_giou_loss_sum.defvjp(_giou_loss_sum_fwd, _giou_loss_sum_bwd)


def giou_loss(
    pred_pts: jnp.ndarray,
    target_quads: jnp.ndarray,
    weight: jnp.ndarray,
    divisor,
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    """Masked convex GIoU loss.

    pred_pts: (M, 18); target_quads: (M, 8); weight: (M,) 0/1 mask·weight;
    divisor: the reference's grad.size(0), i.e. the count of rows that the
    reference would have index-selected (= #(weight > 0) at call sites).
    Returns loss_weight * sum((1-giou)*weight)/divisor, with the reference's
    filtered analytic backward.
    """
    return loss_weight * _giou_loss_sum(
        pred_pts, target_quads, weight, divisor, loss_weight
    )


# ---------------------------------------------------------------------------
# Spatial border loss
# ---------------------------------------------------------------------------


def spatial_border_loss(
    pts: jnp.ndarray,
    gt_quads: jnp.ndarray,
    weight: jnp.ndarray,
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    """Penalty for predicted points that fall outside their gt quad.

    pts: (M, 18) point sets (any coordinate frame; caller pre-normalizes);
    gt_quads: (M, 8); weight: (M,) positive-sample mask.

    loss = loss_weight * [ sum_over_outside(0.2 * dist_to_gt_center)
                           / n_outside ] / (n_pos + 1e-6)
    """
    m = pts.shape[0]
    p = pts.reshape(m, 9, 2)
    quads = gt_quads.reshape(m, 4, 2)
    inside = jax.vmap(points_in_polygon)(p, quads)  # (M, 9)
    pos = weight > 0
    outside = (~inside) & pos[:, None]
    center = (quads[:, 0] + quads[:, 2]) / 2.0  # (M,2): mean of corners 0,2
    d = jnp.sqrt(jnp.sum((p - center[:, None, :]) ** 2, axis=-1) + 1e-12)
    n_out = jnp.sum(outside)
    out_term = jnp.sum(jnp.where(outside, 0.2 * d, 0.0)) / jnp.maximum(n_out, 1)
    n_pos = jnp.sum(pos)
    return loss_weight * out_term / (n_pos.astype(pts.dtype) + 1e-6)


# ---------------------------------------------------------------------------
# Plain IoU loss (reference IoULoss, iou_loss.py:14-62): -log(IoU)
# ---------------------------------------------------------------------------


def iou_loss(
    pred_pts: jnp.ndarray,
    target_quads: jnp.ndarray,
    weight: jnp.ndarray,
    divisor,
    loss_weight: float = 1.0,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """-log(convex IoU) over point sets vs gt quads (masked mean).

    The reference's original RepPoints recipe (head defaults, before the
    configs switched to GIoULoss); provided for config parity.
    """
    from ..ops.geometry import convex_iou_single

    ious = jax.vmap(convex_iou_single)(pred_pts, target_quads)
    loss = -jnp.log(jnp.clip(ious, min=eps))
    return loss_weight * jnp.sum(loss * weight) / jnp.maximum(divisor, 1e-6)
