"""Assignment parity tests against sequential numpy re-derivations of the
reference algorithms (point_assigner.py:99-133, max_iou_assigner.py:91-151).
"""

import numpy as np
import jax.numpy as jnp

from orientedreppoints_tpu.core.assigners import max_iou_assign, point_assign
from orientedreppoints_tpu.core.points import grid_points
from orientedreppoints_tpu.ops.geometry import convex_iou


def _make_points(levels=((16, 16, 8), (8, 8, 16), (4, 4, 32))):
    pts = [np.asarray(grid_points(h, w, s)) for h, w, s in levels]
    return np.concatenate(pts, axis=0)


def _ref_point_assign(points, gts, scale=4, pos_num=1):
    """Sequential reference PointAssigner (numpy re-derivation)."""
    n, g = len(points), len(gts)
    lvl = np.log2(points[:, 2]).astype(int)
    lvl_min, lvl_max = lvl.min(), lvl.max()
    xs, ys = gts[:, 0::2], gts[:, 1::2]
    bb = np.stack([xs.min(1), ys.min(1), xs.max(1), ys.max(1)], axis=1)
    cxy = (bb[:, :2] + bb[:, 2:]) / 2
    wh = np.clip(bb[:, 2:] - bb[:, :2], 1e-6, None)
    gt_lvl = ((np.log2(wh[:, 0] / scale) + np.log2(wh[:, 1] / scale)) / 2)
    gt_lvl = np.clip(gt_lvl.astype(int), lvl_min, lvl_max)
    assigned = np.zeros(n, dtype=int)
    best = np.full(n, np.inf)
    for i in range(g):
        mask = lvl == gt_lvl[i]
        idxs = np.where(mask)[0]
        d = np.linalg.norm((points[idxs, :2] - cxy[i]) / wh[i], axis=1)
        k = min(pos_num, len(idxs))
        top = np.argsort(d)[:k]
        for t in top:
            p = idxs[t]
            if d[t] < best[p]:
                assigned[p] = i + 1
                best[p] = d[t]
    return assigned


def _ref_max_iou_assign(overlaps, pos_thr=0.1, neg_thr=0.1, min_pos=0.0):
    """Sequential reference MaxIoUAssigner.assign_wrt_overlaps."""
    g, n = overlaps.shape
    assigned = np.full(n, -1, dtype=int)
    max_o = overlaps.max(axis=0)
    arg_o = overlaps.argmax(axis=0)
    gt_max = overlaps.max(axis=1)
    assigned[(max_o >= 0) & (max_o < neg_thr)] = 0
    pos = max_o >= pos_thr
    assigned[pos] = arg_o[pos] + 1
    for i in range(g):
        if gt_max[i] >= min_pos:
            assigned[overlaps[i] == gt_max[i]] = i + 1
    return assigned


def _random_gts(rng, g, lo=50, hi=400, wmin=10, wmax=120):
    out = []
    for _ in range(g):
        cx, cy = rng.rand(2) * (hi - lo) + lo
        w, h = rng.rand(2) * (wmax - wmin) + wmin
        a = rng.rand() * np.pi
        c, s = np.cos(a), np.sin(a)
        r = np.array([[-w/2, -h/2], [w/2, -h/2], [w/2, h/2], [-w/2, h/2]])
        out.append((r @ np.array([[c, s], [-s, c]]) + [cx, cy]).reshape(-1))
    return np.array(out, np.float32)


class TestPointAssign:
    def test_matches_reference(self, rng):
        points = _make_points()
        for trial in range(5):
            gts = _random_gts(rng, 6)
            expect = _ref_point_assign(points, gts)
            got = np.asarray(point_assign(
                jnp.asarray(points), jnp.ones(len(points), bool),
                jnp.asarray(gts), jnp.ones(len(gts), bool),
            ))
            np.testing.assert_array_equal(got, expect, err_msg=f"trial {trial}")

    def test_padded_gts_ignored(self, rng):
        points = _make_points()
        gts = _random_gts(rng, 4)
        padded = np.concatenate([gts, np.zeros((4, 8), np.float32)])
        valid = np.array([True] * 4 + [False] * 4)
        got = np.asarray(point_assign(
            jnp.asarray(points), jnp.ones(len(points), bool),
            jnp.asarray(padded), jnp.asarray(valid),
        ))
        expect = _ref_point_assign(points, gts)
        np.testing.assert_array_equal(got, expect)

    def test_empty_gts(self):
        points = _make_points()
        got = np.asarray(point_assign(
            jnp.asarray(points), jnp.ones(len(points), bool),
            jnp.zeros((4, 8), jnp.float32), jnp.zeros(4, bool),
        ))
        assert (got == 0).all()

    def test_invalid_points_not_assigned(self, rng):
        points = _make_points()
        gts = _random_gts(rng, 3)
        pvalid = np.zeros(len(points), bool)  # nothing valid
        got = np.asarray(point_assign(
            jnp.asarray(points), jnp.asarray(pvalid),
            jnp.asarray(gts), jnp.ones(3, bool),
        ))
        assert (got == 0).all()


class TestMaxIoUAssign:
    def test_matches_reference(self, rng):
        points = _make_points()
        n = len(points)
        # proposal point sets: 9 points scattered around each grid center
        prop = np.repeat(points[:, :2], 9, axis=0).reshape(n, 9, 2)
        prop = prop + rng.randn(n, 9, 2) * 8
        prop = prop.reshape(n, 18).astype(np.float32)
        gts = _random_gts(rng, 5)

        overlaps = np.asarray(convex_iou(jnp.asarray(gts), jnp.asarray(prop)))
        expect = _ref_max_iou_assign(overlaps)
        expect = np.maximum(expect, 0)  # our API folds -1 to background

        got, _ = max_iou_assign(
            jnp.asarray(prop), jnp.ones(n, bool),
            jnp.asarray(gts), jnp.ones(5, bool),
        )
        np.testing.assert_array_equal(np.asarray(got), expect)

    def test_empty_gts_all_background(self, rng):
        prop = rng.rand(64, 18).astype(np.float32) * 100
        got, _ = max_iou_assign(
            jnp.asarray(prop), jnp.ones(64, bool),
            jnp.zeros((4, 8), jnp.float32), jnp.zeros(4, bool),
        )
        assert (np.asarray(got) == 0).all()
