"""FPN point-grid generation and offset decoding.

Reference behavior (mmdet/core/anchor/point_generator.py:14-34 and
orientedreppoints_head.py:176-222):
  * grid_points: per-level (x, y, stride) rows, x fastest (row-major mesh).
  * valid_flags: first ceil(img/stride) rows/cols valid (padding border).
  * offset_to_pts: head offsets are (dy, dx) pairs per point (channel order
    y-first, orientedreppoints_head.py:208-216); decode to image coords as
    xy = offset_yx[::-1] * stride + grid_center.

All functions are static-shape, batched, and jit-friendly.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def level_shapes(img_size: tuple[int, int], strides) -> list[tuple[int, int]]:
    """Feature-map (h, w) per FPN level for an input padded to img_size."""
    h, w = img_size
    return [(int(np.ceil(h / s)), int(np.ceil(w / s))) for s in strides]


def grid_points(feat_h: int, feat_w: int, stride: int) -> jnp.ndarray:
    """(feat_h*feat_w, 3) rows of (x, y, stride), x varying fastest."""
    xs = jnp.arange(feat_w, dtype=jnp.float32) * stride
    ys = jnp.arange(feat_h, dtype=jnp.float32) * stride
    xx = jnp.tile(xs, (feat_h,))
    yy = jnp.repeat(ys, feat_w)
    ss = jnp.full_like(xx, float(stride))
    return jnp.stack([xx, yy, ss], axis=-1)


def valid_flags(feat_h: int, feat_w: int, valid_h, valid_w) -> jnp.ndarray:
    """(feat_h*feat_w,) bool; True inside the un-padded image region.

    valid_h / valid_w may be traced scalars (per-image actual sizes).
    """
    row = jnp.arange(feat_h)[:, None]  # (H,1)
    col = jnp.arange(feat_w)[None, :]
    ok = (row < valid_h) & (col < valid_w)
    return ok.reshape(-1)


def multi_level_grid_points(img_size, strides):
    """List of per-level (n_l, 3) point grids for a padded image size."""
    return [
        grid_points(h, w, s)
        for (h, w), s in zip(level_shapes(img_size, strides), strides)
    ]


def multi_level_valid_flags(img_size, strides, img_hw):
    """Per-level valid flags given true (possibly traced) image h, w."""
    out = []
    for (fh, fw), s in zip(level_shapes(img_size, strides), strides):
        vh = jnp.minimum(jnp.ceil(img_hw[0] / s).astype(jnp.int32), fh)
        vw = jnp.minimum(jnp.ceil(img_hw[1] / s).astype(jnp.int32), fw)
        out.append(valid_flags(fh, fw, vh, vw))
    return out


def offset_to_pts(pts_offsets: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Decode head offsets to image-coordinate point sets for one level.

    Args:
      pts_offsets: (B, H, W, 2*num_points) NHWC head output; channel pairs
        are (dy, dx) per point (reference y-first layout).
      stride: level stride.

    Returns:
      (B, H*W, 2*num_points) point sets in (x, y) image coordinates.
    """
    b, h, w, c = pts_offsets.shape
    num_points = c // 2
    off = pts_offsets.reshape(b, h * w, num_points, 2)
    off_xy = off[..., ::-1]  # (dy,dx) -> (dx,dy)
    centers = grid_points(h, w, stride)[:, :2]  # (HW, 2)
    pts = off_xy * float(stride) + centers[None, :, None, :]
    return pts.reshape(b, h * w, 2 * num_points)
