"""HRSC2016 toolkit end-to-end: XML -> labelTxt -> COCO json -> VOC eval.

Reference parity: DOTA_devkit/HRSC2DOTA.py (mbox xml -> DOTA labelTxt),
prepare_hrsc2016.py (labelTxt -> COCO), hrsc2016_evaluation.py (VOC-07 AP
over oriented polys) — exercised here on a synthetic two-image dataset
with a difficult instance and a deliberate false positive.
"""

import json
import os
import os.path as osp

import cv2
import numpy as np
import pytest

from orientedreppoints_tpu.core.rbox import rbox2poly
from orientedreppoints_tpu.devkit.hrsc import (
    eval_hrsc2016, generate_txt_labels, prepare_hrsc2016,
)

XML_TMPL = """<HRSC_Image>
  <Img_ID>{img_id}</Img_ID>
  <HRSC_Objects>
{objects}
  </HRSC_Objects>
</HRSC_Image>
"""

OBJ_TMPL = """    <HRSC_Object>
      <difficult>{difficult}</difficult>
      <mbox_cx>{cx}</mbox_cx><mbox_cy>{cy}</mbox_cy>
      <mbox_w>{w}</mbox_w><mbox_h>{h}</mbox_h>
      <mbox_ang>{ang}</mbox_ang>
    </HRSC_Object>"""


@pytest.fixture
def hrsc_root(tmp_path):
    """Two-image Train split: img a = 2 ships (one difficult), img b = 1."""
    root = tmp_path / "HRSC2016"
    train = root / "Train"
    (train / "AllImages").mkdir(parents=True)
    (train / "Annotations").mkdir()
    ships = {
        "100000001": [
            (120.0, 80.0, 90.0, 30.0, 0.4, 0),
            (260.0, 200.0, 70.0, 22.0, -1.1, 1),  # difficult
        ],
        "100000002": [(160.0, 160.0, 110.0, 36.0, 2.0, 0)],
    }
    for name, objs in ships.items():
        img = np.full((320, 384, 3), 30, np.uint8)
        cv2.imwrite(str(train / "AllImages" / f"{name}.bmp"), img)
        body = "\n".join(
            OBJ_TMPL.format(cx=o[0], cy=o[1], w=o[2], h=o[3], ang=o[4],
                            difficult=o[5]) for o in objs
        )
        (train / "Annotations" / f"{name}.xml").write_text(
            XML_TMPL.format(img_id=name, objects=body)
        )
    return root, ships


class TestHrscPrepare:
    def test_txt_labels(self, hrsc_root):
        root, ships = hrsc_root
        out = generate_txt_labels(str(root / "Train"))
        for name, objs in ships.items():
            lines = open(osp.join(out, f"{name}.txt")).read().splitlines()
            assert len(lines) == len(objs)
            for line, (cx, cy, w, h, ang, difficult) in zip(lines, objs):
                parts = line.split()
                assert parts[8] == "ship"
                assert parts[9] == str(difficult)
                poly = np.array(parts[:8], np.float64).reshape(4, 2)
                want = rbox2poly(
                    np.array([[cx, cy, w, h, ang]])).reshape(4, 2)
                # best-begin-point may rotate the ring; compare as sets
                got = sorted(map(tuple, np.round(poly, 3)))
                exp = sorted(map(tuple, np.round(want, 3)))
                np.testing.assert_allclose(got, exp, atol=1e-3)

    def test_prepare_coco(self, hrsc_root):
        root, ships = hrsc_root
        prepare_hrsc2016(str(root))
        data = json.load(open(root / "Train" / "hrsc_train.json"))
        assert [c["name"] for c in data["categories"]] == ["ship"]
        assert len(data["images"]) == 2
        n_objs = sum(len(v) for v in ships.values())
        assert len(data["annotations"]) == n_objs
        for ann in data["annotations"]:
            assert len(ann["segmentation"][0]) == 8
            assert ann["category_id"] == 1


class TestHrscEval:
    def _write_dets(self, tmp_path, rows):
        det = tmp_path / "Task1_ship.txt"
        det.write_text("\n".join(
            " ".join(str(v) for v in r) for r in rows) + "\n")
        return str(tmp_path / "Task1_{:s}.txt")

    def test_perfect_detections(self, hrsc_root, tmp_path):
        root, ships = hrsc_root
        generate_txt_labels(str(root / "Train"))
        annopath = str(root / "Train" / "labelTxt" / "{:s}.txt")
        rows = []
        for name, objs in ships.items():
            for cx, cy, w, h, ang, difficult in objs:
                if difficult:
                    continue
                poly = rbox2poly(np.array([[cx, cy, w, h, ang]]))[0]
                rows.append([name, 0.95] + list(poly))
        detpath = self._write_dets(tmp_path, rows)
        ap = eval_hrsc2016(detpath, annopath, list(ships), use_07_metric=True)
        assert ap == pytest.approx(1.0)

    def test_difficult_ignored_and_fp_penalized(self, hrsc_root, tmp_path):
        root, ships = hrsc_root
        generate_txt_labels(str(root / "Train"))
        annopath = str(root / "Train" / "labelTxt" / "{:s}.txt")
        rows = []
        for name, objs in ships.items():
            for cx, cy, w, h, ang, difficult in objs:
                # detect EVERYTHING incl. the difficult ship (must not
                # count as FP), plus one far-away false positive
                poly = rbox2poly(np.array([[cx, cy, w, h, ang]]))[0]
                rows.append([name, 0.9] + list(poly))
        fp_poly = rbox2poly(np.array([[40.0, 290.0, 30.0, 12.0, 0.2]]))[0]
        rows.append(["100000002", 0.5] + list(fp_poly))
        detpath = self._write_dets(tmp_path, rows)
        ap = eval_hrsc2016(detpath, annopath, list(ships), use_07_metric=True)
        # recall hits 1.0 before the low-score FP enters: VOC07 AP stays 1
        assert ap == pytest.approx(1.0)
        # high-score FP DOES dent precision
        rows[-1][1] = 0.99
        detpath = self._write_dets(tmp_path, rows)
        ap2 = eval_hrsc2016(detpath, annopath, list(ships),
                            use_07_metric=True)
        assert ap2 < 1.0
