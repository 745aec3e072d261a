"""HRSC2016 ship-detection support.

Reference parity:
  * HRSC2DOTA.py:10-77 — XML annotations (mbox cx, cy, w, h, ang) ->
    DOTA-format labelTxt with difficult flags (xml parsed with the stdlib
    instead of xmltodict);
  * prepare_hrsc2016.py — labelTxt -> COCO-poly json;
  * hrsc2016_evaluation.py:87-269 — VOC-07/12 AP on oriented polys
    (shared with evaluation.voc_eval_poly).
"""

from __future__ import annotations

import os
import os.path as osp
import xml.etree.ElementTree as ET

import numpy as np

from ..core.rbox import rbox2poly
from .dota2coco import dota2coco_train
from .evaluation import voc_eval_poly


def _parse_hrsc_xml(xml_file: str):
    """Extract (cx, cy, w, h, ang, difficult) rows from an HRSC XML."""
    root = ET.parse(xml_file).getroot()
    out = []
    for obj in root.iter("HRSC_Object"):
        def g(tag, default="0"):
            el = obj.find(tag)
            return el.text if el is not None and el.text else default

        out.append(
            (
                float(g("mbox_cx")), float(g("mbox_cy")),
                float(g("mbox_w")), float(g("mbox_h")),
                float(g("mbox_ang")), g("difficult"),
            )
        )
    return out


def generate_txt_labels(root_path: str, img_dir="AllImages",
                        ann_dir="Annotations"):
    """HRSC XML -> DOTA labelTxt (difficult 0 kept, 1 marked ignore)."""
    img_path = osp.join(root_path, img_dir)
    label_path = osp.join(root_path, ann_dir)
    out_path = osp.join(root_path, "labelTxt")
    os.makedirs(out_path, exist_ok=True)
    for img_name in sorted(os.listdir(img_path)):
        base = osp.splitext(img_name)[0]
        xml_file = osp.join(label_path, base + ".xml")
        lines = []
        if osp.exists(xml_file):
            for cx, cy, w, h, ang, difficult in _parse_hrsc_xml(xml_file):
                poly = rbox2poly(np.array([[cx, cy, w, h, ang]]))[0]
                coords = " ".join(str(v) for v in poly)
                flag = "1" if difficult == "1" else "0"
                lines.append(f"{coords} ship {flag}")
        with open(osp.join(out_path, base + ".txt"), "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
    return out_path


def prepare_hrsc2016(root_path: str, ext: str = ".bmp"):
    """Full HRSC prep: XML -> labelTxt -> COCO json (prepare_hrsc2016.py)."""
    for split in ("Train", "Test"):
        split_dir = osp.join(root_path, split)
        if not osp.isdir(split_dir):
            continue
        generate_txt_labels(split_dir)
        # COCO converter expects images/ + labelTxt/
        imgs = osp.join(split_dir, "images")
        if not osp.exists(imgs):
            os.symlink(
                osp.join(split_dir, "AllImages"), imgs,
                target_is_directory=True,
            )
        dota2coco_train(
            split_dir,
            osp.join(split_dir, f"hrsc_{split.lower()}.json"),
            cls_names=("ship",),
            ext=ext,
        )


def eval_hrsc2016(detpath, annopath, imagesetfile_or_names,
                  ovthresh=0.5, use_07_metric=True):
    """HRSC VOC AP for the single 'ship' class."""
    from .evaluation import _imagenames

    names = _imagenames(imagesetfile_or_names)
    rec, prec, ap = voc_eval_poly(
        detpath, annopath, names, "ship", ovthresh, use_07_metric
    )
    return ap
