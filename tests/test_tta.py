"""Multi-scale + flip TTA merge tests (reference aug_test +
rbbox_mapping_back semantics, orientedreppoints_detector.py:81-136,
core/bbox/transforms.py:298-301)."""

import jax.numpy as jnp
import numpy as np

from orientedreppoints_tpu.devkit.polygon import poly_iou
from orientedreppoints_tpu.models import merge_aug_and_nms


def axis_box(cx, cy, w, h):
    return np.array(
        [cx - w/2, cy - h/2, cx + w/2, cy - h/2,
         cx + w/2, cy + h/2, cx - w/2, cy + h/2], np.float32
    )


class TestMergeAug:
    def make_augs(self):
        """Three well-separated boxes seen by three augs:
        scale 1 unflipped, scale 2 flipped, scale 0.5 unflipped."""
        orig = np.stack([
            axis_box(60, 60, 40, 20),
            axis_box(200, 80, 30, 30),
            axis_box(120, 220, 50, 14),
        ])
        scores = np.zeros((3, 16), np.float32)
        scores[0, 3] = 0.9
        scores[1, 5] = 0.8
        scores[2, 3] = 0.7

        augs = []
        # aug 0: identity
        augs.append((orig.copy(), scores.copy(), False, (512, 512), 1.0))
        # aug 1: x2 test scale + horizontal flip in the (1024, 1024) frame
        b = orig * 2.0
        b = b.copy()
        b[:, 0::2] = 1024 - b[:, 0::2] - 1
        augs.append((b, scores.copy() * 0.95, True, (1024, 1024), 2.0))
        # aug 2: x0.5 test scale, no flip
        augs.append((orig * 0.5, scores.copy() * 0.9, False, (256, 256), 0.5))
        return orig, augs

    def test_mapping_back_and_merge(self):
        orig, augs = self.make_augs()
        dets, labels, valid = merge_aug_and_nms(
            [jnp.asarray(a[0]) for a in augs],
            [jnp.asarray(a[1]) for a in augs],
            [a[2] for a in augs],
            [a[3] for a in augs],
            [a[4] for a in augs],
            score_thr=0.05, iou_thr=0.4, max_per_img=10,
        )
        dets = np.asarray(dets)[np.asarray(valid)]
        labels = np.asarray(labels)[np.asarray(valid)]
        # the three aug copies of each box collapse to one detection each
        assert len(dets) == 3, dets
        matched = set()
        for d, lab in zip(dets, labels):
            ious = [poly_iou(g, d[:8]) for g in orig]
            j = int(np.argmax(ious))
            # flip uses the pixel-index convention (W - x - 1), so the
            # mapped-back box is within a pixel of the original
            assert ious[j] > 0.9, (ious, d)
            matched.add(j)
        assert matched == {0, 1, 2}
        # classes preserved through the merge (labels are 0-based fg)
        assert set(np.asarray(labels)) == {2, 4}

    def test_single_shape_scalar_broadcast(self):
        """Old flip-only signature (one shape, one scale) still works."""
        orig, _ = self.make_augs()
        scores = np.zeros((3, 16), np.float32)
        scores[:, 1] = 0.9
        flipped = orig.copy()
        flipped[:, 0::2] = 512 - flipped[:, 0::2] - 1
        dets, labels, valid = merge_aug_and_nms(
            [jnp.asarray(orig), jnp.asarray(flipped)],
            [jnp.asarray(scores), jnp.asarray(scores * 0.9)],
            [False, True],
            (512, 512),
            1.0,
            score_thr=0.05, iou_thr=0.4, max_per_img=10,
        )
        dets = np.asarray(dets)[np.asarray(valid)]
        assert len(dets) == 3
        for d in dets:
            assert max(poly_iou(g, d[:8]) for g in orig) > 0.9
