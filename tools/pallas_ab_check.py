#!/usr/bin/env python
"""Real-size A/B parity check: Pallas TPU kernels vs the vmapped-XLA
implementations of the same math, on the actual chip at production sizes
(VERDICT r1 item #8 — interpret-mode tests only cover tiny shapes).

Checks (sizes mirror production decode/assign shapes):
  * quad_iou_matrix_pallas          4096 x 4096 pairwise IoU
  * quad_iou_matrix_batch_pallas    4 x 2048 x 2048
  * hull_quad_iou_matrix_pallas     64 hulls x 21824 quads (assigner shape)
  * min_area_rect_pallas            21824 point sets (decode shape)

Asserts max |diff| < 1e-3 on IoUs and area/center agreement for the rects;
prints per-kernel timings (scalar-fetch forced completion).
"""

from __future__ import annotations

import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def random_quads(rng, n, scale=800.0, wmax=80):
    cx = rng.rand(n, 1, 2) * scale + 100
    w = rng.rand(n, 1) * wmax + 8
    h = rng.rand(n, 1) * wmax + 8
    a = rng.rand(n) * np.pi
    c, s = np.cos(a), np.sin(a)
    base = np.stack(
        [np.stack([-w[:, 0]/2, -h[:, 0]/2], 1),
         np.stack([w[:, 0]/2, -h[:, 0]/2], 1),
         np.stack([w[:, 0]/2, h[:, 0]/2], 1),
         np.stack([-w[:, 0]/2, h[:, 0]/2], 1)], 1,
    )  # (n,4,2)
    rot = np.stack([np.stack([c, s], -1), np.stack([-s, c], -1)], -2)
    return (base @ rot + cx).reshape(n, 8).astype(np.float32)


def timed(fn, *args, iters=3):
    import jax.numpy as jnp

    out = fn(*args)
    float(jnp.sum(out if not isinstance(out, tuple) else out[0]))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out if not isinstance(out, tuple) else out[0]))
    return out, (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/orp_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from orientedreppoints_tpu.ops.geometry import (
        convex_hull, min_area_rect_single, quad_iou_matrix,
    )
    from orientedreppoints_tpu.ops.pallas_minarearect import (
        convex_hull_pallas, min_area_rect_pallas,
    )
    from orientedreppoints_tpu.ops.pallas_quad_iou import (
        hull_quad_iou_matrix_pallas, quad_iou_matrix_batch_pallas,
        quad_iou_matrix_pallas,
    )

    assert jax.default_backend() == "tpu", (
        "A/B check must run on the real chip; backend="
        + jax.default_backend()
    )
    rng = np.random.RandomState(0)
    report = {}

    # ---- 1. pairwise quad IoU at NMS size -------------------------------
    n = 4096
    qa = jnp.asarray(random_quads(rng, n))
    pal, t_pal = timed(jax.jit(quad_iou_matrix_pallas), qa, qa)
    xla, t_xla = timed(jax.jit(quad_iou_matrix), qa, qa)
    d = float(jnp.max(jnp.abs(pal - xla)))
    report["quad_iou_4096x4096"] = dict(
        max_abs_diff=d, pallas_ms=round(t_pal * 1e3, 2),
        xla_ms=round(t_xla * 1e3, 2))
    print("quad_iou_4096x4096", report["quad_iou_4096x4096"], flush=True)
    assert d < 1e-3, d

    # ---- 2. batched pairwise IoU (batched NMS shape) ---------------------
    b, nb = 4, 2048
    qb = jnp.asarray(
        random_quads(rng, b * nb).reshape(b, nb, 8))
    pal, t_pal = timed(jax.jit(quad_iou_matrix_batch_pallas), qb, qb)
    xla, t_xla = timed(jax.jit(jax.vmap(quad_iou_matrix)), qb, qb)
    d = float(jnp.max(jnp.abs(pal - xla)))
    report["quad_iou_batch_4x2048"] = dict(
        max_abs_diff=d, pallas_ms=round(t_pal * 1e3, 2),
        xla_ms=round(t_xla * 1e3, 2))
    print("quad_iou_batch_4x2048", report["quad_iou_batch_4x2048"],
          flush=True)
    assert d < 1e-3, d

    # ---- 3. hull x quad IoU at assigner size ------------------------------
    n_pts, n_gt = 21824, 64
    pts = jnp.asarray(
        rng.randn(n_pts, 18).astype(np.float32) * 20
        + rng.rand(n_pts, 1).astype(np.float32) * 800
    )
    gts = jnp.asarray(random_quads(rng, n_gt))
    hulls, counts = jax.jit(convex_hull_pallas)(pts)

    pal, t_pal = timed(
        jax.jit(hull_quad_iou_matrix_pallas), hulls, counts, gts)

    def xla_hull_iou(hulls, counts, quads):
        from orientedreppoints_tpu.ops.geometry import (
            _EPS, convex_intersection_area, polygon_area,
        )

        def pair(hull, cnt, quad):
            inter = convex_intersection_area(hull, cnt, quad.reshape(4, 2))
            ap = polygon_area(hull, cnt)
            aq = polygon_area(quad.reshape(4, 2))
            return inter / jnp.maximum(ap + aq - inter, _EPS)

        return jax.vmap(
            jax.vmap(pair, in_axes=(None, None, 0)), in_axes=(0, 0, None)
        )(hulls, counts, quads)

    xla, t_xla = timed(jax.jit(xla_hull_iou), hulls, counts, gts)
    d = float(jnp.max(jnp.abs(pal - xla)))
    report["hull_iou_64x21824"] = dict(
        max_abs_diff=d, pallas_ms=round(t_pal * 1e3, 2),
        xla_ms=round(t_xla * 1e3, 2))
    print("hull_iou_64x21824", report["hull_iou_64x21824"], flush=True)
    assert d < 1e-3, d

    # ---- 4. min-area rect at decode size ----------------------------------
    # Pallas runs the full 21824 sets; the XLA reference is evaluated on a
    # 2048-set slice — vmapping the calipers graph over all 21k sets
    # crashes the TPU worker (XLA-side fault, not the kernel under test),
    # and elementwise parity on a large random slice is the same evidence.
    pal, t_pal = timed(jax.jit(min_area_rect_pallas), pts)
    n_ref = 2048
    xla, t_xla = timed(jax.jit(jax.vmap(min_area_rect_single)),
                       pts[:n_ref])
    pal_cmp = pal[:n_ref]

    def rect_area(r):
        x, y = r[:, 0::2], r[:, 1::2]
        return 0.5 * jnp.abs(jnp.sum(
            x * jnp.roll(y, -1, 1) - jnp.roll(x, -1, 1) * y, axis=1))

    # Correct A/B metric for min-area rects: the rect must (a) contain all
    # its points and (b) be area-optimal vs the reference. Centers are NOT
    # compared — near-tied caliper orientations (area gap ~1e-5) legally
    # produce different rects under f32 argmin tie-breaking (verified:
    # every center disagreement in this setup is such a tie, and the
    # disagreements split ~50/50 against cv2).
    area_d = float(jnp.max((rect_area(pal_cmp) - rect_area(xla))
                           / jnp.maximum(rect_area(xla), 1e-3)))

    def contains_all(rects, P):
        r = np.asarray(rects).reshape(-1, 4, 2)
        pts_np = np.asarray(P).reshape(len(r), 9, 2)
        viol = 0
        for k in range(len(r)):
            c = r[k].mean(0)
            for e in range(4):
                ev = r[k][(e + 1) % 4] - r[k][e]
                nrm = np.array([-ev[1], ev[0]])
                nrm /= np.linalg.norm(nrm) + 1e-9
                if (c - r[k][e]) @ nrm < 0:
                    nrm = -nrm
                if (((pts_np[k] - r[k][e]) @ nrm) < -0.05).any():
                    viol += 1
                    break
        return viol

    viol = contains_all(pal_cmp, pts[:n_ref])
    report["min_area_rect_21824"] = dict(
        max_pallas_area_excess=round(area_d, 6),
        containment_violations=viol,
        pallas_ms=round(t_pal * 1e3, 2),
        xla_ms_2048_slice=round(t_xla * 1e3, 2))
    print("min_area_rect_21824", report["min_area_rect_21824"], flush=True)
    assert area_d < 1e-3, area_d
    assert viol == 0, viol

    print(json.dumps(report, indent=2))
    print("PALLAS A/B PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
