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
