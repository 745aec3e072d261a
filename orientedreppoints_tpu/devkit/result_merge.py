"""Merge per-tile detections back to original DOTA frames + cross-tile NMS.

Reference parity (DOTA_devkit/ResultMerge_multi_process.py):
  * per-class Task1_<cls>.txt rows: `subimgname score x0 y0 ... x3 y3`;
  * tile naming inverted to (origin name, rate, left, up) (:182-203);
  * polys mapped back: (x + left) / rate (poly2origpoly :173-180);
  * per-original-image greedy polygon NMS at thresh 0.1 with HBB prefilter
    and exact polygon IoU (py_cpu_nms_poly_fast :60-121);
  * 16-way multiprocessing over class files (:225-231).
"""

from __future__ import annotations

import os
import os.path as osp
from functools import partial
from multiprocessing import Pool

import numpy as np

from . import dota_utils as util
from .polygon import poly_nms

NMS_THRESH = 0.1


def merge_single(dstpath: str, nms_thresh: float, fullname: str):
    name = util.basename_noext(fullname)
    dstname = osp.join(dstpath, name + ".txt")
    nameboxdict: dict[str, list] = {}
    with open(fullname) as f:
        for line in f:
            parts = line.strip().split(" ")
            if len(parts) < 10:
                continue
            subname = parts[0]
            oriname, rate, left, up = util.parse_tile_name(subname)
            score = float(parts[1])
            poly = np.array([float(v) for v in parts[2:10]], np.float64)
            orig = np.empty(9, np.float64)
            orig[0:8:2] = (poly[0::2] + left) / rate
            orig[1:8:2] = (poly[1::2] + up) / rate
            orig[8] = score
            nameboxdict.setdefault(oriname, []).append(orig)
    with open(dstname, "w") as f:
        for imgname, dets in nameboxdict.items():
            dets = np.stack(dets)
            keep = poly_nms(dets, nms_thresh)
            for i in keep:
                d = dets[i]
                coords = " ".join(str(v) for v in d[:8])
                f.write(f"{imgname} {d[8]} {coords}\n")


def merge_by_poly(srcpath: str, dstpath: str, nms_thresh: float = NMS_THRESH,
                  num_process: int = 16):
    """mergebypoly: merge every per-class file under srcpath into dstpath."""
    os.makedirs(dstpath, exist_ok=True)
    files = util.list_files(srcpath, ".txt")
    if num_process <= 1:
        for fn in files:
            merge_single(dstpath, nms_thresh, fn)
    else:
        with Pool(min(num_process, len(files) or 1)) as pool:
            pool.map(partial(merge_single, dstpath, nms_thresh), files)


def write_task1_results(results_per_image, class_names, out_dir: str):
    """Write per-class Task1 txt files from per-image detections.

    results_per_image: dict image_name -> list over classes of (k, 9)
    [poly(8), score] arrays — the rbbox2result output layout
    (tools/parse_pkl/parse_pkl_mege_results_for_dota_evaluation.py).
    """
    os.makedirs(out_dir, exist_ok=True)
    handles = {
        c: open(osp.join(out_dir, f"Task1_{c}.txt"), "w")
        for c in class_names
    }
    try:
        for img_name, per_class in results_per_image.items():
            for ci, dets in enumerate(per_class):
                c = class_names[ci]
                dets = np.asarray(dets)
                if dets.size == 0:
                    continue
                # rows may be (k, 9) or (k, 27) with 18 reppoints prepended;
                # the poly+score always occupy the last 9 columns
                for d in dets.reshape(len(dets), -1):
                    poly, score = d[-9:-1], d[-1]
                    coords = " ".join(f"{v}" for v in poly)
                    handles[c].write(f"{img_name} {score} {coords}\n")
    finally:
        for h in handles.values():
            h.close()
