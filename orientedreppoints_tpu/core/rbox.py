"""Rotated-box / polygon conversions (host-side numpy).

Behavior-parity notes (reference: mmdet/core/bbox/transforms.py):
  * rbox2poly   — xywhθ -> 8-pt corners, then best-begin-point normalization
                  (transforms.py:401-421).
  * poly2rbox   — 8-pt -> xywhθ with the longest-edge convention and angle
                  normalized to [-π/4, 3π/4) (transforms.py:424-466).
  * best begin point — cyclic re-ordering that minimizes total corner
                  distance to the axis-aligned bbox corners
                  (transforms.py:469-509 / DOTA_devkit/dota_utils.py).
  * rbbox_flip / rbbox_mapping_back — flip uses the `dim - x - 1` convention
                  (transforms.py:273-301).

These run in the data pipeline, result formatting and the offline devkit —
all host CPU paths, so they are numpy (vectorized, no per-box python loops).
"""

from __future__ import annotations

import numpy as np

PI = np.pi


def rbox2poly(rboxes: np.ndarray) -> np.ndarray:
    """(n, 5) [cx, cy, w, h, angle] -> (n, 8) corner polys (best-begin-point).

    Corner order before normalization: tl, tr, br, bl rotated by `angle`.
    """
    rboxes = np.asarray(rboxes, dtype=np.float64).reshape(-1, 5)
    cx, cy, w, h, ang = rboxes.T
    dx, dy = w / 2, h / 2
    # local corners: (tl, tr, br, bl)
    local_x = np.stack([-dx, dx, dx, -dx], axis=1)  # (n,4)
    local_y = np.stack([-dy, -dy, dy, dy], axis=1)
    cos, sin = np.cos(ang)[:, None], np.sin(ang)[:, None]
    gx = cos * local_x - sin * local_y + cx[:, None]
    gy = sin * local_x + cos * local_y + cy[:, None]
    polys = np.stack([gx, gy], axis=2).reshape(-1, 8).astype(np.float32)
    return get_best_begin_point(polys)


def poly2rbox(polys: np.ndarray) -> np.ndarray:
    """(n, 8) corner polys -> (n, 5) [cx, cy, w, h, angle].

    Longest-edge convention: width = the longer of edge(p1,p2)/edge(p2,p3);
    angle along the long edge, normalized to [-π/4, 3π/4).
    """
    polys = np.asarray(polys, dtype=np.float64).reshape(-1, 8)
    p = polys.reshape(-1, 4, 2)
    e1 = np.linalg.norm(p[:, 0] - p[:, 1], axis=1)
    e2 = np.linalg.norm(p[:, 1] - p[:, 2], axis=1)
    wide = e1 > e2
    width = np.where(wide, e1, e2)
    height = np.where(wide, e2, e1)
    ang1 = np.arctan2(p[:, 1, 1] - p[:, 0, 1], p[:, 1, 0] - p[:, 0, 0])
    ang2 = np.arctan2(p[:, 3, 1] - p[:, 0, 1], p[:, 3, 0] - p[:, 0, 0])
    angle = np.where(wide, ang1, ang2)
    angle = (angle + PI / 4) % PI - PI / 4
    cx = (p[:, 0, 0] + p[:, 2, 0]) / 2
    cy = (p[:, 0, 1] + p[:, 2, 1]) / 2
    return np.stack([cx, cy, width, height, angle], axis=1).astype(np.float32)


def poly2rbox_v3(polys: np.ndarray) -> np.ndarray:
    """(n, 8) -> (n, 5), the devkit's square-aware angle convention.

    DOTA_devkit/dota_poly2rbox.py:128-189 poly2rbox_single_v3: like
    poly2rbox, but when max_edge/min_edge < 1.15 (near-square, where the
    longest-edge angle is ill-conditioned) BOTH candidate angles are
    normalized to [-pi/4, 3pi/4) and the one with the smaller |angle|
    wins, with width = max edge.  The reference's mAOE evaluator scores
    angles in this convention (mAOE_evaluation.py:163-168) — using the
    plain longest-edge form there inflates square-box error tails by up
    to ~90 deg.
    """
    polys = np.asarray(polys, dtype=np.float64).reshape(-1, 8)
    p = polys.reshape(-1, 4, 2)
    e1 = np.linalg.norm(p[:, 0] - p[:, 1], axis=1)
    e2 = np.linalg.norm(p[:, 1] - p[:, 2], axis=1)
    ang1 = np.arctan2(p[:, 1, 1] - p[:, 0, 1], p[:, 1, 0] - p[:, 0, 0])
    ang2 = np.arctan2(p[:, 3, 1] - p[:, 0, 1], p[:, 3, 0] - p[:, 0, 0])
    n1 = (ang1 + PI / 4) % PI - PI / 4
    n2 = (ang2 + PI / 4) % PI - PI / 4
    max_e = np.maximum(e1, e2)
    min_e = np.minimum(e1, e2)
    near_square = max_e / np.maximum(min_e, 1e-12) < 1.15
    square_angle = np.where(np.abs(n1) > np.abs(n2), n2, n1)
    long_angle = np.where(e1 > e2, n1, n2)
    angle = np.where(near_square, square_angle, long_angle)
    width = np.where(near_square, max_e, np.where(e1 > e2, e1, e2))
    height = np.where(near_square, min_e, np.where(e1 > e2, e2, e1))
    cx = (p[:, 0, 0] + p[:, 2, 0]) / 2
    cy = (p[:, 0, 1] + p[:, 2, 1]) / 2
    return np.stack([cx, cy, width, height, angle], axis=1).astype(
        np.float32)


def get_best_begin_point(polys: np.ndarray) -> np.ndarray:
    """Cyclically rotate each poly so corners best match its AABB corners.

    For each of the 4 cyclic shifts, compute the summed distance between the
    shifted corners and the axis-aligned bbox corners
    [(xmin,ymin),(xmax,ymin),(xmax,ymax),(xmin,ymax)]; keep the best shift.
    """
    polys = np.asarray(polys, dtype=np.float32).reshape(-1, 8)
    p = polys.reshape(-1, 4, 2)
    xmin = p[..., 0].min(axis=1)
    xmax = p[..., 0].max(axis=1)
    ymin = p[..., 1].min(axis=1)
    ymax = p[..., 1].max(axis=1)
    ref = np.stack(
        [
            np.stack([xmin, ymin], axis=1),
            np.stack([xmax, ymin], axis=1),
            np.stack([xmax, ymax], axis=1),
            np.stack([xmin, ymax], axis=1),
        ],
        axis=1,
    )  # (n, 4, 2)
    shifts = np.stack([np.roll(p, -k, axis=1) for k in range(4)], axis=1)
    # (n, 4shifts, 4corners, 2)
    dists = np.linalg.norm(shifts - ref[:, None], axis=3).sum(axis=2)
    best = dists.argmin(axis=1)
    out = shifts[np.arange(len(p)), best]
    return out.reshape(-1, 8)


def rbbox_flip(polys: np.ndarray, img_shape, direction: str = "horizontal"):
    """Flip (n, 8k) polys in-image; uses the reference `dim - x - 1` rule."""
    polys = np.asarray(polys)
    out = polys.copy()
    if direction == "horizontal":
        out[..., 0::2] = img_shape[1] - polys[..., 0::2] - 1
    else:
        out[..., 1::2] = img_shape[0] - polys[..., 1::2] - 1
    return out


def rbbox_mapping_back(polys, img_shape, scale_factor, flip, direction="horizontal"):
    """Map polys from an augmented test scale back to the original image."""
    out = rbbox_flip(polys, img_shape, direction) if flip else polys
    return np.asarray(out) / scale_factor


def rbbox2result(polys_scores: np.ndarray, labels: np.ndarray, num_classes: int):
    """Split (n, 9[+18]) detections into per-foreground-class arrays.

    num_classes includes background (reference convention: 16 for DOTA-15).
    Returns a list of num_classes-1 arrays.
    """
    polys_scores = np.asarray(polys_scores)
    labels = np.asarray(labels)
    width = polys_scores.shape[1] if polys_scores.ndim == 2 else 9
    if polys_scores.shape[0] == 0:
        return [np.zeros((0, width), dtype=np.float32) for _ in range(num_classes - 1)]
    return [
        polys_scores[labels == i].astype(np.float32)
        for i in range(num_classes - 1)
    ]


def poly_area(polys: np.ndarray) -> np.ndarray:
    """Shoelace area of (n, 2k) polygons."""
    polys = np.asarray(polys, dtype=np.float64)
    p = polys.reshape(polys.shape[0], -1, 2)
    x, y = p[..., 0], p[..., 1]
    xn, yn = np.roll(x, -1, axis=1), np.roll(y, -1, axis=1)
    return 0.5 * np.abs(np.sum(x * yn - xn * y, axis=1))
