"""Golden-value tests for the oriented geometry core.

Oracles:
  * cv2.convexHull / cv2.minAreaRect / cv2.intersectConvexConvex — the same
    OpenCV semantics the reference data pipeline relies on.
  * numpy/shapely-free exact polygon clipping for IoU parity with the
    reference CUDA kernels (documented in SURVEY.md §2.2).
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orientedreppoints_tpu.ops import geometry as G


def random_pointsets(rng, n, num=9, scale=100.0, offset=500.0):
    return (rng.rand(n, num, 2) * scale + offset).astype(np.float32)


def random_quads(rng, n, scale=80.0, offset=500.0):
    """Random rotated rectangles as (n, 8) polys."""
    out = []
    for _ in range(n):
        cx, cy = rng.rand(2) * scale + offset
        w, h = rng.rand(2) * scale + 5.0
        ang = rng.rand() * np.pi
        c, s = np.cos(ang), np.sin(ang)
        rect = np.array(
            [[-w / 2, -h / 2], [w / 2, -h / 2], [w / 2, h / 2], [-w / 2, h / 2]]
        )
        rot = rect @ np.array([[c, s], [-s, c]])
        rot += [cx, cy]
        out.append(rot.reshape(-1))
    return np.array(out, dtype=np.float32)


def cv2_hull_area(pts):
    hull = cv2.convexHull(pts.astype(np.float32))
    return cv2.contourArea(hull)


def cv2_inter_area(poly1, poly2):
    """Intersection area via cv2.intersectConvexConvex on convex inputs."""
    h1 = cv2.convexHull(poly1.astype(np.float32))
    h2 = cv2.convexHull(poly2.astype(np.float32))
    area, _ = cv2.intersectConvexConvex(h1, h2)
    return float(area)


class TestConvexHull:
    def test_hull_area_matches_cv2(self, rng):
        pts = random_pointsets(rng, 64)
        hull_fn = jax.jit(jax.vmap(lambda p: G.polygon_area(*_hull_area_args(p))))
        areas = np.asarray(hull_fn(jnp.asarray(pts)))
        for i in range(len(pts)):
            expect = cv2_hull_area(pts[i])
            assert areas[i] == pytest.approx(expect, rel=2e-3, abs=1e-2), i

    def test_hull_count_square(self):
        pts = jnp.array(
            [[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5], [0.2, 0.8],
             [0.6, 0.1], [0.3, 0.3], [0.9, 0.5]],
            dtype=jnp.float32,
        )
        _, mask, count = G.convex_hull(pts)
        assert int(count) == 4

    def test_hull_degenerate_all_same(self):
        pts = jnp.ones((9, 2), dtype=jnp.float32) * 5.0
        hull, mask, count = G.convex_hull(pts)
        assert int(count) == 1
        assert np.allclose(np.asarray(hull[0]), [5.0, 5.0])

    def test_hull_collinear(self):
        pts = jnp.stack(
            [jnp.arange(9, dtype=jnp.float32), jnp.arange(9, dtype=jnp.float32)],
            axis=-1,
        )
        hull, mask, count = G.convex_hull(pts)
        area = G.polygon_area(hull, count)
        assert float(area) == pytest.approx(0.0, abs=1e-3)


def _hull_area_args(p):
    hull, mask, count = G.convex_hull(p)
    return hull, count


class TestConvexIoU:
    def test_iou_matches_cv2(self, rng):
        pts = random_pointsets(rng, 32).reshape(32, 18)
        quads = random_quads(rng, 8)
        iou = np.asarray(G.convex_iou(jnp.asarray(quads), jnp.asarray(pts)))
        assert iou.shape == (8, 32)
        for i in range(8):
            for j in range(32):
                p = pts[j].reshape(9, 2)
                q = quads[i].reshape(4, 2)
                inter = cv2_inter_area(p, q)
                union = cv2_hull_area(p) + cv2.contourArea(
                    cv2.convexHull(q.astype(np.float32))
                ) - inter
                expect = inter / max(union, 1e-9)
                assert iou[i, j] == pytest.approx(expect, abs=2e-3), (i, j)

    def test_identical_quad_iou_one(self, rng):
        quads = random_quads(rng, 8)
        m = np.asarray(G.quad_iou_matrix(jnp.asarray(quads), jnp.asarray(quads)))
        assert np.allclose(np.diag(m), 1.0, atol=2e-3)

    def test_disjoint_iou_zero(self):
        q1 = np.array([[0, 0, 10, 0, 10, 10, 0, 10]], dtype=np.float32)
        q2 = q1 + 100.0
        m = np.asarray(G.quad_iou_matrix(jnp.asarray(q1), jnp.asarray(q2)))
        assert m[0, 0] == pytest.approx(0.0, abs=1e-6)

    def test_quad_iou_matches_exact(self, rng):
        quads1 = random_quads(rng, 12)
        quads2 = random_quads(rng, 12)
        m = np.asarray(
            G.quad_iou_matrix(jnp.asarray(quads1), jnp.asarray(quads2))
        )
        for i in range(12):
            for j in range(12):
                inter = cv2_inter_area(
                    quads1[i].reshape(4, 2), quads2[j].reshape(4, 2)
                )
                a1 = cv2.contourArea(cv2.convexHull(quads1[i].reshape(4, 2)))
                a2 = cv2.contourArea(cv2.convexHull(quads2[j].reshape(4, 2)))
                expect = inter / max(a1 + a2 - inter, 1e-9)
                assert m[i, j] == pytest.approx(expect, abs=2e-3), (i, j)


class TestConvexGIoU:
    def test_giou_bounds(self, rng):
        pts = random_pointsets(rng, 64).reshape(64, 18)
        quads = random_quads(rng, 64)
        giou = np.asarray(G.convex_giou(jnp.asarray(pts), jnp.asarray(quads)))
        assert np.all(giou <= 1.0 + 1e-5)
        assert np.all(giou >= -1.0 - 1e-5)

    def test_giou_perfect_overlap(self, rng):
        quads = random_quads(rng, 16)
        # point set = the 4 corners + center replicated -> hull == quad
        q = quads.reshape(16, 4, 2)
        center = q.mean(axis=1, keepdims=True)
        pts = np.concatenate([q, np.repeat(center, 5, axis=1)], axis=1)
        giou = np.asarray(
            G.convex_giou(jnp.asarray(pts.reshape(16, 18)), jnp.asarray(quads))
        )
        assert np.allclose(giou, 1.0, atol=5e-3)

    def test_giou_value_matches_definition(self, rng):
        pts = random_pointsets(rng, 16).reshape(16, 18)
        quads = random_quads(rng, 16)
        giou = np.asarray(G.convex_giou(jnp.asarray(pts), jnp.asarray(quads)))
        for i in range(16):
            p = pts[i].reshape(9, 2)
            q = quads[i].reshape(4, 2)
            inter = cv2_inter_area(p, q)
            ap = cv2_hull_area(p)
            aq = cv2.contourArea(cv2.convexHull(q))
            union = ap + aq - inter
            c = cv2_hull_area(np.concatenate([p, q], axis=0))
            expect = inter / union - (c - union) / c
            assert giou[i] == pytest.approx(expect, abs=3e-3), i

    def test_giou_grad_flows(self, rng):
        pts = jnp.asarray(random_pointsets(rng, 4).reshape(4, 18))
        quads = jnp.asarray(random_quads(rng, 4))
        grad = jax.grad(lambda p: jnp.sum(G.convex_giou(p, quads)))(pts)
        assert np.all(np.isfinite(np.asarray(grad)))
        assert np.any(np.asarray(grad) != 0)


class TestMinAreaRect:
    def test_matches_cv2_area(self, rng):
        pts = random_pointsets(rng, 64)
        rects = np.asarray(G.min_area_rect(jnp.asarray(pts.reshape(64, 18))))
        for i in range(64):
            (cx, cy), (w, h), ang = cv2.minAreaRect(pts[i].astype(np.float32))
            expect_area = w * h
            got = rects[i].reshape(4, 2)
            got_area = cv2.contourArea(got.astype(np.float32))
            # NOTE: the min-area rect can be non-unique (ties across support
            # edges occur in random data), so compare areas, not corners.
            assert got_area == pytest.approx(expect_area, rel=5e-3, abs=1e-2), i

    def test_rect_encloses_points(self, rng):
        pts = random_pointsets(rng, 16)
        rects = np.asarray(G.min_area_rect(jnp.asarray(pts.reshape(16, 18))))
        for i in range(16):
            quad = rects[i].reshape(4, 2)
            inside = np.asarray(
                G.points_in_polygon(
                    jnp.asarray(pts[i]), jnp.asarray(_grow(quad, 1.002))
                )
            )
            assert inside.all(), i

    def test_degenerate(self):
        pts = jnp.ones((1, 18), dtype=jnp.float32) * 3.0
        rect = np.asarray(G.min_area_rect(pts))
        assert np.allclose(rect, 3.0)


def _grow(quad, factor):
    c = quad.mean(axis=0, keepdims=True)
    return (quad - c) * factor + c


class TestPointsInPolygon:
    def test_simple_square(self):
        poly = jnp.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=jnp.float32)
        pts = jnp.array(
            [[5, 5], [15, 5], [-1, 3], [9.9, 9.9], [5, 10.5]], dtype=jnp.float32
        )
        inside = np.asarray(G.points_in_polygon(pts, poly))
        assert inside.tolist() == [True, False, False, True, False]

    def test_rotated_quad_matches_cv2(self, rng):
        quads = random_quads(rng, 8)
        pts = (rng.rand(64, 2) * 160 + 460).astype(np.float32)
        for i in range(8):
            quad = quads[i].reshape(4, 2)
            got = np.asarray(
                G.points_in_polygon(jnp.asarray(pts), jnp.asarray(quad))
            )
            for j in range(64):
                r = cv2.pointPolygonTest(
                    quad.astype(np.float32), tuple(pts[j]), False
                )
                # skip boundary-ambiguous points
                if abs(
                    cv2.pointPolygonTest(quad.astype(np.float32), tuple(pts[j]), True)
                ) < 1e-3:
                    continue
                assert got[j] == (r > 0), (i, j)


class TestChamfer:
    def test_chamfer_zero_identical(self, rng):
        s = jnp.asarray(rng.rand(4, 40, 2).astype(np.float32))
        d = np.asarray(G.chamfer_distance_2d(s, s))
        assert np.allclose(d, 0.0, atol=1e-4)

    def test_chamfer_matches_numpy(self, rng):
        s1 = rng.rand(3, 40, 2).astype(np.float32) * 50
        s2 = rng.rand(3, 40, 2).astype(np.float32) * 50
        got = np.asarray(G.chamfer_distance_2d(jnp.asarray(s1), jnp.asarray(s2)))
        for b in range(3):
            d2 = ((s1[b][:, None] - s2[b][None]) ** 2).sum(-1)
            expect = 0.05 * (
                np.sqrt(d2.min(1)).mean() + np.sqrt(d2.min(0)).mean()
            ) / 2
            assert got[b] == pytest.approx(expect, rel=1e-4)
