"""evaluate_results parity with the devkit evaluator: VOC difficult
semantics + HBB prefilter (VERDICT r1 weak #7)."""

import numpy as np

from orientedreppoints_tpu.apis import evaluate_results


def box(cx, cy, w, h):
    return np.array(
        [cx - w/2, cy - h/2, cx + w/2, cy - h/2,
         cx + w/2, cy + h/2, cx - w/2, cy + h/2], np.float32
    )


class FakeDataset:
    CLASSES = ("plane", "ship")

    def __init__(self, anns):
        self.img_infos = [
            {"file_name": f"img{i}.png"} for i in range(len(anns))
        ]
        self.anns = anns


def det_row(poly, score):
    return np.concatenate([poly, [score]]).astype(np.float32)[None]


class TestDifficultSemantics:
    def test_difficult_gt_excluded_from_npos(self):
        # one easy + one difficult plane gt; perfect det on each
        ds = FakeDataset([
            dict(
                bboxes=np.stack([box(50, 50, 30, 20), box(150, 50, 30, 20)]),
                labels=np.array([1, 1], np.int64),
                difficult=np.array([0, 1], np.int64),
            )
        ])
        results = {
            "img0": [
                np.concatenate([
                    det_row(box(50, 50, 30, 20), 0.9),
                    det_row(box(150, 50, 30, 20), 0.8),
                ]),
                np.zeros((0, 9), np.float32),
            ]
        }
        mAP, aps = evaluate_results(results, ds, use_07_metric=False)
        # the difficult match is neither TP nor FP; the easy gt is found:
        # recall 1/1, precision path unharmed -> AP 1.0
        assert aps["plane"] == 1.0
        assert np.isnan(aps["ship"])
        assert mAP == 1.0

    def test_difficult_not_counted_without_difficult_field(self):
        # datasets without a difficult array behave as before
        ds = FakeDataset([
            dict(
                bboxes=box(50, 50, 30, 20)[None],
                labels=np.array([1], np.int64),
            )
        ])
        results = {
            "img0": [det_row(box(50, 50, 30, 20), 0.9),
                     np.zeros((0, 9), np.float32)]
        }
        mAP, aps = evaluate_results(results, ds, use_07_metric=False)
        assert aps["plane"] == 1.0

    def test_false_positive_counted(self):
        ds = FakeDataset([
            dict(
                bboxes=box(50, 50, 30, 20)[None],
                labels=np.array([1], np.int64),
                difficult=np.array([0], np.int64),
            )
        ])
        results = {
            "img0": [
                np.concatenate([
                    det_row(box(50, 50, 30, 20), 0.9),
                    det_row(box(200, 200, 30, 20), 0.8),  # FP far away
                ]),
                np.zeros((0, 9), np.float32),
            ]
        }
        mAP, aps = evaluate_results(results, ds, use_07_metric=False)
        assert 0.99 < aps["plane"] <= 1.0  # recall 1 at rank 1; FP after
