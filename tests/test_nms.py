"""Rotated NMS tests: device greedy NMS vs the host devkit poly_nms oracle,
multiclass semantics, batched-vs-single consistency."""

import numpy as np
import jax.numpy as jnp

from orientedreppoints_tpu.devkit.polygon import poly_nms
from orientedreppoints_tpu.ops.nms import (
    multiclass_rnms,
    multiclass_rnms_batch,
    rotated_nms_mask,
)


def random_quads(rng, n, scale=200.0, wmax=60):
    out = []
    for _ in range(n):
        cx, cy = rng.rand(2) * scale + 50
        w, h = rng.rand(2) * wmax + 10
        a = rng.rand() * np.pi
        c, s = np.cos(a), np.sin(a)
        r = np.array([[-w/2, -h/2], [w/2, -h/2], [w/2, h/2], [-w/2, h/2]])
        out.append(((r @ [[c, s], [-s, c]]) + [cx, cy]).reshape(-1))
    return np.array(out, np.float32)


class TestRotatedNms:
    def test_matches_host_oracle(self, rng):
        for trial in range(4):
            quads = random_quads(rng, 64)
            scores = rng.rand(64).astype(np.float32)
            keep_dev = np.asarray(
                rotated_nms_mask(jnp.asarray(quads), jnp.asarray(scores), 0.3)
            )
            dets = np.concatenate([quads, scores[:, None]], axis=1)
            keep_host = np.zeros(64, bool)
            keep_host[poly_nms(dets, 0.3)] = True
            # allow boundary-IoU disagreements only
            diff = keep_dev != keep_host
            assert diff.sum() <= 1, (trial, np.where(diff))

    def test_invalid_never_kept(self, rng):
        quads = random_quads(rng, 16)
        scores = rng.rand(16).astype(np.float32)
        valid = np.zeros(16, bool)
        valid[:4] = True
        keep = np.asarray(rotated_nms_mask(
            jnp.asarray(quads), jnp.asarray(scores), 0.3, jnp.asarray(valid)
        ))
        assert not keep[4:].any()


class TestMulticlass:
    def _inputs(self, rng, n=48, c=5):
        boxes = random_quads(rng, n)
        scores = rng.rand(n, c + 1).astype(np.float32) * 0.6
        scores[:, 0] = 0  # background pad
        return boxes, scores

    def test_classes_do_not_suppress_each_other(self, rng):
        boxes = np.tile(random_quads(rng, 1), (2, 1))
        scores = np.zeros((2, 3), np.float32)
        scores[0, 1] = 0.9  # class 0
        scores[1, 2] = 0.8  # class 1, identical box
        dets, labels, valid = multiclass_rnms(
            jnp.asarray(boxes), jnp.asarray(scores), 0.05, 0.4, 10
        )
        assert int(np.asarray(valid).sum()) == 2
        assert sorted(np.asarray(labels)[np.asarray(valid)].tolist()) == [0, 1]

    def test_batch_matches_single(self, rng):
        boxes1, scores1 = self._inputs(rng)
        boxes2, scores2 = self._inputs(rng)
        d1, l1, v1 = multiclass_rnms(
            jnp.asarray(boxes1), jnp.asarray(scores1), 0.05, 0.4, 20
        )
        d2, l2, v2 = multiclass_rnms(
            jnp.asarray(boxes2), jnp.asarray(scores2), 0.05, 0.4, 20
        )
        db, lb, vb = multiclass_rnms_batch(
            jnp.asarray(np.stack([boxes1, boxes2])),
            jnp.asarray(np.stack([scores1, scores2])),
            0.05, 0.4, 20,
        )
        np.testing.assert_allclose(np.asarray(db[0]), np.asarray(d1), atol=1e-4)
        np.testing.assert_allclose(np.asarray(db[1]), np.asarray(d2), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(vb[0]), np.asarray(v1))
        np.testing.assert_array_equal(np.asarray(lb[1]), np.asarray(l2))

    def test_score_threshold(self, rng):
        boxes, scores = self._inputs(rng)
        dets, labels, valid = multiclass_rnms(
            jnp.asarray(boxes), jnp.asarray(scores), 0.99, 0.4, 20
        )
        assert int(np.asarray(valid).sum()) == 0
        assert np.all(np.asarray(dets) == 0)


def ref_soft_nms(iou_mat, scores, method, iou_thr, sigma, min_score):
    """Sequential soft-NMS re-derivation (reference cpu_soft_nms semantics,
    nms_wrapper.py:120-175)."""
    s = scores.astype(np.float64).copy()
    n = len(s)
    processed = np.zeros(n, bool)
    keep = np.zeros(n, bool)
    for _ in range(n):
        cand = np.where(~processed, s, -1e9)
        j = int(np.argmax(cand))
        ok = cand[j] > min_score
        processed[j] = True
        keep[j] = ok
        if not ok:
            continue
        for i in range(n):
            if processed[i]:
                continue
            iou = iou_mat[j, i]
            if method == "linear":
                if iou > iou_thr:
                    s[i] *= 1.0 - iou
            else:
                s[i] *= np.exp(-(iou * iou) / sigma)
    return s, keep


class TestSoftNms:
    def test_hbb_matches_sequential(self, rng):
        from orientedreppoints_tpu.ops.nms import (
            hbb_iou_matrix_legacy, soft_nms_hbb,
        )

        for method in ("linear", "gaussian"):
            xy = rng.rand(40, 2) * 150
            wh = rng.rand(40, 2) * 60 + 10
            boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
            scores = rng.rand(40).astype(np.float32)
            iou = np.asarray(hbb_iou_matrix_legacy(jnp.asarray(boxes),
                                                   jnp.asarray(boxes)))
            want_s, want_k = ref_soft_nms(iou, scores, method, 0.3, 0.5, 1e-3)
            got_s, got_k = soft_nms_hbb(
                jnp.asarray(boxes), jnp.asarray(scores), method=method
            )
            np.testing.assert_array_equal(np.asarray(got_k), want_k)
            np.testing.assert_allclose(np.asarray(got_s), want_s, rtol=1e-4)

    def test_rotated_soft_nms(self, rng):
        from orientedreppoints_tpu.devkit.polygon import poly_iou
        from orientedreppoints_tpu.ops.nms import soft_rnms

        quads = random_quads(rng, 32)
        scores = rng.rand(32).astype(np.float32)
        iou = np.array([[poly_iou(a, b) for b in quads] for a in quads])
        want_s, want_k = ref_soft_nms(iou, scores, "gaussian", 0.3, 0.5, 1e-3)
        got_s, got_k = soft_rnms(jnp.asarray(quads), jnp.asarray(scores))
        assert (np.asarray(got_k) == want_k).mean() > 0.95  # iou fp tolerance
        np.testing.assert_allclose(np.asarray(got_s), want_s, rtol=0.02,
                                   atol=1e-4)

    def test_hard_hbb_nms(self, rng):
        from orientedreppoints_tpu.ops.nms import nms_hbb

        boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                         np.float32)
        scores = np.array([0.9, 0.8, 0.7], np.float32)
        keep = np.asarray(nms_hbb(jnp.asarray(boxes), jnp.asarray(scores),
                                  0.5))
        np.testing.assert_array_equal(keep, [True, False, True])


class TestBlockedScan:
    """greedy_scan_sorted (blocked/unrolled) vs the naive sequential scan
    on random suppression matrices, across block-boundary sizes."""

    @staticmethod
    def _naive(over, valid):
        n = valid.shape[0]
        suppressed = np.zeros(n, bool)
        for i in range(n):
            if valid[i] and not suppressed[i]:
                suppressed[i + 1:] |= over[i, i + 1:]
        return valid & ~suppressed

    def test_matches_naive(self, rng):
        from orientedreppoints_tpu.ops.nms import greedy_scan_sorted

        for n in (1, 5, 127, 128, 129, 300):
            over = rng.rand(n, n) < 0.15
            valid = rng.rand(n) < 0.9
            got = np.asarray(greedy_scan_sorted(
                jnp.asarray(over), jnp.asarray(valid)))
            expect = self._naive(over, valid)
            np.testing.assert_array_equal(got, expect, err_msg=f"n={n}")

    def test_batched_matches_naive(self, rng):
        from orientedreppoints_tpu.ops.nms import greedy_scan_sorted

        b, n = 3, 200
        over = rng.rand(b, n, n) < 0.2
        valid = rng.rand(b, n) < 0.9
        got = np.asarray(greedy_scan_sorted(
            jnp.asarray(over), jnp.asarray(valid)))
        for bi in range(b):
            np.testing.assert_array_equal(
                got[bi], self._naive(over[bi], valid[bi]), err_msg=f"b={bi}")
