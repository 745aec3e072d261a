"""DOTA labelTxt -> COCO-poly JSON converters and the xywhθ JSON variant.

Reference parity:
  * DOTA2COCOTrain/DOTA2COCOTest (DOTA_devkit/DOTA2COCO_poly.py:16-123):
    bbox = the 8 polygon coords, categories in class order, difficult='2'
    instances skipped for training;
  * generate_json_labels (DOTA2JSON.py:55-92): per-image json records with
    xywhθ boxes (longest-edge convention).
"""

from __future__ import annotations

import json
import os.path as osp

import cv2
import numpy as np

from ..core.rbox import poly2rbox
from . import dota_utils as util


def dota2coco_train(
    srcpath: str,
    destfile: str,
    cls_names=util.DOTA10_CLASSES,
    skip_difficult: str = "2",
    ext: str = ".png",
):
    imagedir = osp.join(srcpath, "images")
    labeldir = osp.join(srcpath, "labelTxt")
    data = {
        "images": [],
        "categories": [
            {"id": i + 1, "name": n, "supercategory": n}
            for i, n in enumerate(cls_names)
        ],
        "annotations": [],
    }
    inst_id, image_id = 1, 1
    for label_file in util.list_files(labeldir, ".txt"):
        base = util.basename_noext(label_file)
        img_path = osp.join(imagedir, base + ext)
        img = cv2.imread(img_path)
        if img is None:
            continue
        h, w = img.shape[:2]
        data["images"].append(
            {"file_name": base + ext, "id": image_id, "width": w, "height": h}
        )
        for obj in util.parse_dota_poly(label_file):
            if obj["difficult"] == skip_difficult:
                continue
            if obj["name"] not in cls_names:
                continue
            poly = [float(v) for v in np.asarray(obj["poly"]).reshape(-1)]
            data["annotations"].append(
                {
                    "id": inst_id,
                    "image_id": image_id,
                    "category_id": cls_names.index(obj["name"]) + 1,
                    "bbox": poly,
                    "segmentation": [poly],
                    "iscrowd": 0,
                    "area": util.poly_area(poly),
                    # carried so per-epoch val can apply VOC difficult
                    # semantics (reference evals ignore difficult gts)
                    "difficult": int(obj["difficult"]),
                }
            )
            inst_id += 1
        image_id += 1
    with open(destfile, "w") as f:
        json.dump(data, f)
    return destfile


def dota2coco_test(
    srcpath: str, destfile: str, cls_names=util.DOTA10_CLASSES,
    ext: str = ".png",
):
    """Image-only COCO json for the test split (no labelTxt available)."""
    imagedir = osp.join(srcpath, "images")
    data = {
        "images": [],
        "categories": [
            {"id": i + 1, "name": n, "supercategory": n}
            for i, n in enumerate(cls_names)
        ],
        "annotations": [],
    }
    image_id = 1
    for img_path in util.list_files(imagedir, ext):
        img = cv2.imread(img_path)
        if img is None:
            continue
        h, w = img.shape[:2]
        data["images"].append(
            {
                "file_name": osp.basename(img_path),
                "id": image_id,
                "width": w,
                "height": h,
            }
        )
        image_id += 1
    with open(destfile, "w") as f:
        json.dump(data, f)
    return destfile


def generate_json_labels(srcpath: str, destfile: str, trainval: bool = True):
    """Per-image list json with xywhθ boxes (DOTA2JSON.py:55-92)."""
    labeldir = osp.join(srcpath, "labelTxt")
    imagedir = osp.join(srcpath, "images")
    records = []
    if trainval:
        files = util.list_files(labeldir, ".txt")
        names = [util.basename_noext(p) for p in files]
    else:
        names = [
            util.basename_noext(p) for p in util.list_files(imagedir)
        ]
    for base in names:
        objs = (
            util.parse_dota_poly(osp.join(labeldir, base + ".txt"))
            if trainval
            else []
        )
        ann = {"bboxes": [], "labels": [], "bboxes_ignore": [],
               "labels_ignore": []}
        for o in objs:
            rb = poly2rbox(np.asarray(o["poly"])[None])[0].tolist()
            if o["name"] not in util.DOTA10_CLASSES:
                continue
            lab = util.DOTA10_CLASSES.index(o["name"]) + 1
            if o["difficult"] == "1" or o["difficult"] == "2":
                ann["bboxes_ignore"].append(rb)
                ann["labels_ignore"].append(lab)
            else:
                ann["bboxes"].append(rb)
                ann["labels"].append(lab)
        records.append({"filename": base, "ann": ann})
    with open(destfile, "w") as f:
        json.dump(records, f)
    return destfile
