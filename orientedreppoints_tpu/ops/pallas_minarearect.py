"""Fused Pallas TPU kernel: convex hull + min-area rect of 9-point sets.

Replaces the vmapped-XLA Jarvis scan + rotating calipers
(ops/geometry.py::min_area_rect / convex_hull) on no-grad paths: inference
decode (head get_bboxes minAreaRect, orientedreppoints_head.py:746) and the
APAA orientation term (:543-544), plus the hull stage of the refine
assigner's convex IoU.

Layout: one point SET per lane — inputs transposed to (18, N) so every
per-set scalar is a (1, TN) row and the whole gift-wrap/calipers pipeline
is unrolled elementwise VPU code (no scan, no gather, no sort).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TN = 128
_BIG = 1e20
K = 9  # points per set


def _mar_kernel(p_ref, rect_ref, hull_ref, cnt_ref):
    """p_ref: (18, TN); rect_ref: (8, TN); hull_ref: (18, TN);
    cnt_ref: (1, TN) int32."""
    px = [p_ref[2 * k : 2 * k + 1, :] for k in range(K)]
    py = [p_ref[2 * k + 1 : 2 * k + 2, :] for k in range(K)]
    # center for f32 robustness
    cx = sum(px) / K
    cy = sum(py) / K
    px = [x - cx for x in px]
    py = [y - cy for y in py]
    scale2 = px[0] * 0.0
    for k in range(K):
        scale2 = jnp.maximum(scale2, px[k] * px[k] + py[k] * py[k])
    left_eps = 1e-6 * scale2
    dup_eps = 1e-12 * scale2 + 1e-30

    # start: min-x point (value-tracked)
    sx, sy = px[0], py[0]
    for k in range(1, K):
        better = px[k] < sx
        sx = jnp.where(better, px[k], sx)
        sy = jnp.where(better, py[k], sy)

    # gift wrapping, value-tracked; hull slot i holds the i-th hull vertex
    hx = [sx] + [sx * 0.0 for _ in range(K - 1)]
    hy = [sy] + [sy * 0.0 for _ in range(K - 1)]
    valid = [jnp.ones_like(sx, dtype=jnp.bool_)] + [
        jnp.zeros_like(sx, dtype=jnp.bool_) for _ in range(K - 1)
    ]
    curx, cury = sx, sy
    done = jnp.zeros_like(sx, dtype=jnp.bool_)
    for step in range(1, K):
        best_rank = jnp.full_like(sx, jnp.inf)
        bx, by = curx, cury
        for c in range(K):
            dxc = px[c] - curx
            dyc = py[c] - cury
            d2 = dxc * dxc + dyc * dyc
            ok = d2 > dup_eps
            score = jnp.zeros_like(sx)
            for q in range(K):
                crs = dxc * (py[q] - cury) - dyc * (px[q] - curx)
                score = score + (crs > left_eps).astype(jnp.float32)
            rank = jnp.where(ok, score * 1e9 - d2, jnp.inf)
            better = rank < best_rank
            best_rank = jnp.where(better, rank, best_rank)
            bx = jnp.where(better, px[c], bx)
            by = jnp.where(better, py[c], by)
        none_found = ~jnp.isfinite(best_rank)
        back = (bx - sx) ** 2 + (by - sy) ** 2 <= dup_eps
        new_done = done | none_found | back
        emit = ~new_done
        hx[step] = jnp.where(emit, bx, sx)
        hy[step] = jnp.where(emit, by, sy)
        valid[step] = emit
        curx = jnp.where(emit, bx, curx)
        cury = jnp.where(emit, by, cury)
        done = new_done

    cnt = sum(v.astype(jnp.int32) for v in valid)

    # rotating calipers over hull edges (value-tracked argmin by area)
    best_area = jnp.full_like(sx, jnp.inf)
    b_ct = jnp.ones_like(sx)
    b_st = jnp.zeros_like(sx)
    b_x0 = sx * 1.0
    b_x1 = sx * 1.0
    b_y0 = sy * 1.0
    b_y1 = sy * 1.0
    for i in range(K):
        # next hull vertex: slot i+1 if valid else slot 0 (contiguous prefix)
        if i + 1 < K:
            nxv = valid[i + 1]
            nx = jnp.where(nxv, hx[i + 1], hx[0])
            ny = jnp.where(nxv, hy[i + 1], hy[0])
        else:
            nx, ny = hx[0], hy[0]
        ex = nx - hx[i]
        ey = ny - hy[i]
        elen = jnp.sqrt(ex * ex + ey * ey)
        e_ok = valid[i] & (elen > 1e-9) & (cnt > 1)
        ct = jnp.where(e_ok, ex / jnp.maximum(elen, 1e-9), 1.0)
        st = jnp.where(e_ok, ey / jnp.maximum(elen, 1e-9), 0.0)
        # rotate hull points by -theta: rx = ct*x + st*y ; ry = -st*x + ct*y
        xmin = jnp.full_like(sx, jnp.inf)
        xmax = jnp.full_like(sx, -jnp.inf)
        ymin = jnp.full_like(sx, jnp.inf)
        ymax = jnp.full_like(sx, -jnp.inf)
        for j in range(K):
            rx = ct * hx[j] + st * hy[j]
            ry = -st * hx[j] + ct * hy[j]
            big = jnp.where(valid[j], 0.0, _BIG)
            xmin = jnp.minimum(xmin, rx + big)
            xmax = jnp.maximum(xmax, rx - big)
            ymin = jnp.minimum(ymin, ry + big)
            ymax = jnp.maximum(ymax, ry - big)
        area = (xmax - xmin) * (ymax - ymin)
        area = jnp.where(e_ok, area, jnp.inf)
        better = area < best_area
        best_area = jnp.where(better, area, best_area)
        b_ct = jnp.where(better, ct, b_ct)
        b_st = jnp.where(better, st, b_st)
        b_x0 = jnp.where(better, xmin, b_x0)
        b_x1 = jnp.where(better, xmax, b_x1)
        b_y0 = jnp.where(better, ymin, b_y0)
        b_y1 = jnp.where(better, ymax, b_y1)

    degenerate = ~jnp.isfinite(best_area)
    corners = [
        (b_x0, b_y0), (b_x1, b_y0), (b_x1, b_y1), (b_x0, b_y1),
    ]
    for ci, (rx, ry) in enumerate(corners):
        # rotate back by +theta and recenter
        gx = b_ct * rx - b_st * ry + cx
        gy = b_st * rx + b_ct * ry + cy
        gx = jnp.where(degenerate, hx[0] + cx, gx)
        gy = jnp.where(degenerate, hy[0] + cy, gy)
        rect_ref[2 * ci : 2 * ci + 1, :] = gx
        rect_ref[2 * ci + 1 : 2 * ci + 2, :] = gy

    for j in range(K):
        keep = valid[j]
        hull_ref[2 * j : 2 * j + 1, :] = jnp.where(keep, hx[j], hx[0]) + cx
        hull_ref[2 * j + 1 : 2 * j + 2, :] = jnp.where(keep, hy[j], hy[0]) + cy
    cnt_ref[:, :] = cnt.astype(jnp.int32)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _use_xla_fallback() -> bool:
    if os.environ.get("ORP_FORCE_PALLAS_INTERPRET"):
        return False
    return jax.default_backend() != "tpu"


def _run(points: jnp.ndarray):
    n = points.shape[0]
    pad = (-n) % TN
    p = jnp.pad(points.astype(jnp.float32).reshape(n, 2 * K), ((0, pad), (0, 0)))
    pt = p.T  # (18, Np)
    np_ = pt.shape[1]
    rect, hull, cnt = pl.pallas_call(
        _mar_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((8, np_), jnp.float32),
            jax.ShapeDtypeStruct((2 * K, np_), jnp.float32),
            jax.ShapeDtypeStruct((1, np_), jnp.int32),
        ),
        grid=(np_ // TN,),
        in_specs=[
            pl.BlockSpec((2 * K, TN), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((8, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * K, TN), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(pt)
    return rect.T[:n], hull.T[:n].reshape(n, K, 2), cnt[0, :n]


def min_area_rect_pallas(points: jnp.ndarray) -> jnp.ndarray:
    """(n, 18) point sets -> (n, 8) min-area-rect corners."""
    if _use_xla_fallback():
        from .geometry import min_area_rect_single

        return jax.vmap(min_area_rect_single)(points)
    return _run(points)[0]


def convex_hull_pallas(points: jnp.ndarray):
    """(n, 18) -> (hulls (n, 9, 2), counts (n,)). Padding repeats vertex 0."""
    if _use_xla_fallback():
        from .geometry import convex_hull

        hulls, _, counts = jax.vmap(
            lambda p: convex_hull(p.reshape(-1, 2))
        )(points)
        return hulls, counts
    _, hull, cnt = _run(points)
    return hull, cnt
