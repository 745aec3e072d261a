"""Pallas kernel parity tests (interpret mode on CPU, tiny shapes).

The wrappers route to vmapped-XLA fallbacks off-TPU; these tests force the
kernels through the interpreter to pin their numerics against cv2.
NOTE: uses distinctive shapes so jit caches from fallback-path tests can't
collide with the forced-interpret traces.
"""

import os

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def force_interpret(monkeypatch):
    monkeypatch.setenv("ORP_FORCE_PALLAS_INTERPRET", "1")


def random_quads(rng, n, scale=80.0, offset=300.0):
    out = []
    for _ in range(n):
        cx, cy = rng.rand(2) * scale + offset
        w, h = rng.rand(2) * 40 + 10
        a = rng.rand() * np.pi
        c, s = np.cos(a), np.sin(a)
        r = np.array([[-w/2, -h/2], [w/2, -h/2], [w/2, h/2], [-w/2, h/2]])
        out.append(((r @ [[c, s], [-s, c]]) + [cx, cy]).reshape(-1))
    return np.array(out, np.float32)


class TestQuadKernel:
    def test_vs_cv2(self, rng):
        from orientedreppoints_tpu.ops.pallas_quad_iou import (
            quad_iou_matrix_pallas,
        )

        a = random_quads(rng, 9)
        b = random_quads(rng, 11)
        got = np.asarray(quad_iou_matrix_pallas(jnp.asarray(a), jnp.asarray(b)))
        for i in range(9):
            for j in range(11):
                h1 = cv2.convexHull(a[i].reshape(4, 2))
                h2 = cv2.convexHull(b[j].reshape(4, 2))
                inter, _ = cv2.intersectConvexConvex(h1, h2)
                a1, a2 = cv2.contourArea(h1), cv2.contourArea(h2)
                exp = inter / max(a1 + a2 - inter, 1e-9)
                assert got[i, j] == pytest.approx(exp, abs=1e-4), (i, j)


class TestHullKernel:
    def test_vs_cv2(self, rng):
        from orientedreppoints_tpu.ops.pallas_quad_iou import (
            hull_quad_iou_matrix_pallas,
        )
        from orientedreppoints_tpu.ops.pallas_minarearect import (
            convex_hull_pallas,
        )

        pts = (rng.rand(13, 9, 2) * 60 + 310).astype(np.float32)
        quads = random_quads(rng, 11)
        hulls, counts = convex_hull_pallas(jnp.asarray(pts.reshape(13, 18)))
        got = np.asarray(
            hull_quad_iou_matrix_pallas(hulls, counts, jnp.asarray(quads))
        )
        for i in range(13):
            for j in range(11):
                h1 = cv2.convexHull(pts[i])
                h2 = cv2.convexHull(quads[j].reshape(4, 2))
                inter, _ = cv2.intersectConvexConvex(h1, h2)
                a1, a2 = cv2.contourArea(h1), cv2.contourArea(h2)
                exp = inter / max(a1 + a2 - inter, 1e-9)
                assert got[i, j] == pytest.approx(exp, abs=1e-4), (i, j)


class TestMinAreaRectKernel:
    def test_vs_cv2(self, rng):
        from orientedreppoints_tpu.ops.pallas_minarearect import (
            min_area_rect_pallas,
        )

        pts = (rng.rand(21, 9, 2) * 120 + 400).astype(np.float32)
        rects = np.asarray(min_area_rect_pallas(jnp.asarray(pts.reshape(21, 18))))
        for i in range(21):
            (cx, cy), (w, h), _ = cv2.minAreaRect(pts[i])
            got_area = cv2.contourArea(rects[i].reshape(4, 2))
            assert got_area == pytest.approx(w * h, rel=1e-3, abs=1e-2), i

    def test_degenerate(self):
        from orientedreppoints_tpu.ops.pallas_minarearect import (
            min_area_rect_pallas,
        )

        rect = np.asarray(min_area_rect_pallas(jnp.ones((5, 18)) * 3.0))
        assert np.allclose(rect, 3.0)


class TestUpperTriKernel:
    def test_upper_tri_matches_full(self, rng):
        """upper_tri=True: strict upper triangle equals the full kernel,
        everything else is exactly zero (single + batched, across the
        8x128 tile boundary)."""
        from orientedreppoints_tpu.ops.pallas_quad_iou import (
            quad_iou_matrix_pallas, quad_iou_matrix_batch_pallas,
        )

        n = 140  # spans both grid dims: 18 row tiles x 2 col tiles
        a = random_quads(rng, n, scale=30.0)
        full = np.asarray(
            quad_iou_matrix_pallas(jnp.asarray(a), jnp.asarray(a)))
        tri = np.asarray(quad_iou_matrix_pallas(
            jnp.asarray(a), jnp.asarray(a), upper_tri=True))
        upper = np.triu(np.ones((n, n), bool), k=1)
        np.testing.assert_allclose(tri[upper], full[upper], atol=1e-6)
        assert (tri[~upper] == 0).all()

        ab = np.stack([a, random_quads(rng, n, scale=30.0)])
        full_b = np.asarray(quad_iou_matrix_batch_pallas(
            jnp.asarray(ab), jnp.asarray(ab)))
        tri_b = np.asarray(quad_iou_matrix_batch_pallas(
            jnp.asarray(ab), jnp.asarray(ab), upper_tri=True))
        for bi in range(2):
            np.testing.assert_allclose(
                tri_b[bi][upper], full_b[bi][upper], atol=1e-6)
            assert (tri_b[bi][~upper] == 0).all()

    def test_valid_prefix_skip(self, rng):
        """num_valid zeroes everything at/beyond the prefix and keeps the
        in-prefix upper triangle exact."""
        from orientedreppoints_tpu.ops.pallas_quad_iou import (
            quad_iou_matrix_pallas, quad_iou_matrix_batch_pallas,
        )

        n, nv = 40, 17
        a = random_quads(rng, n, scale=25.0)
        full = np.asarray(
            quad_iou_matrix_pallas(jnp.asarray(a), jnp.asarray(a)))
        tri = np.asarray(quad_iou_matrix_pallas(
            jnp.asarray(a), jnp.asarray(a), upper_tri=True,
            num_valid=jnp.int32(nv)))
        rows = np.arange(n)[:, None]
        cols = np.arange(n)[None, :]
        live = (cols > rows) & (rows < nv) & (cols < nv)
        np.testing.assert_allclose(tri[live], full[live], atol=1e-6)
        assert (tri[~live] == 0).all()

        ab = np.stack([a, random_quads(rng, n, scale=25.0)])
        nvb = jnp.asarray([17, 3], jnp.int32)
        tri_b = np.asarray(quad_iou_matrix_batch_pallas(
            jnp.asarray(ab), jnp.asarray(ab), upper_tri=True, num_valid=nvb))
        full_b = np.asarray(quad_iou_matrix_batch_pallas(
            jnp.asarray(ab), jnp.asarray(ab)))
        for bi, v in enumerate([17, 3]):
            live = (cols > rows) & (rows < v) & (cols < v)
            np.testing.assert_allclose(
                tri_b[bi][live], full_b[bi][live], atol=1e-6)
            assert (tri_b[bi][~live] == 0).all()


class TestOverMaskKernel:
    def test_over_mask_matches_thresholded_iou(self, rng):
        """quad_over_matrix_pallas == (IoU > thr) on the live region and
        False elsewhere (single + batched, spanning the 64-row tile)."""
        from orientedreppoints_tpu.ops.pallas_quad_iou import (
            quad_iou_matrix_pallas, quad_over_matrix_batch_pallas,
            quad_over_matrix_pallas,
        )

        n, nv, thr = 150, 83, 0.2
        a = random_quads(rng, n, scale=22.0)
        full = np.asarray(
            quad_iou_matrix_pallas(jnp.asarray(a), jnp.asarray(a)))
        over = np.asarray(quad_over_matrix_pallas(
            jnp.asarray(a), thr, num_valid=jnp.int32(nv)))
        rows = np.arange(n)[:, None]
        cols = np.arange(n)[None, :]
        live = (cols > rows) & (rows < nv) & (cols < nv)
        np.testing.assert_array_equal(over[live], full[live] > thr)
        assert not over[~live].any()

        ab = np.stack([a, random_quads(rng, n, scale=22.0)])
        nvb = jnp.asarray([83, 5], jnp.int32)
        over_b = np.asarray(quad_over_matrix_batch_pallas(
            jnp.asarray(ab), thr, num_valid=nvb))
        for bi, v in enumerate([83, 5]):
            fb = np.asarray(quad_iou_matrix_pallas(
                jnp.asarray(ab[bi]), jnp.asarray(ab[bi])))
            live = (cols > rows) & (rows < v) & (cols < v)
            np.testing.assert_array_equal(over_b[bi][live], fb[live] > thr)
            assert not over_b[bi][~live].any()

