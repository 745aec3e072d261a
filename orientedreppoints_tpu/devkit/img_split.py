"""Tile gigapixel DOTA scenes into fixed-size patches (host, multiprocess).

Reference parity (DOTA_devkit/ImgSplit_multi_process.py):
  * sliding window `subsize` with stride subsize - gap, last window snapped
    to the image edge (SplitSingle :226-268);
  * optional pre-resize `rate` (multiscale prep uses 0.5/1.0/1.5);
  * gt polys clipped against each tile (shapely there, numpy S-H here):
    fully-inside polys kept verbatim; partially-inside clipped, 5-gons
    reduced by merging the shortest edge's endpoints (GetPoly4FromPoly5
    :134-158), >5-gons dropped, vertices re-ordered to best match the
    original poly (choose_best_pointorder_fit_another :19-37), coords
    clamped to [1, subsize];
  * instances with inter/area <= thresh (0.7) relabeled difficult='2'
    (savepatches :160-225);
  * naming `name__rate__left___up`; zero-padded patches.
"""

from __future__ import annotations

import os
import os.path as osp
from functools import partial
from multiprocessing import Pool

import cv2
import numpy as np

from . import dota_utils as util
from .polygon import clip_polygon, orient_ccw, polygon_area


def reduce_poly5_to_poly4(poly: np.ndarray) -> np.ndarray:
    """Merge the endpoints of the shortest edge of a 5-gon into their
    midpoint (GetPoly4FromPoly5 semantics)."""
    p = np.asarray(poly, np.float64).reshape(5, 2)
    edges = np.linalg.norm(np.roll(p, -1, axis=0) - p, axis=1)
    s = int(np.argmin(edges))
    merged = (p[s] + p[(s + 1) % 5]) / 2.0
    keep = [i for i in range(5) if i != s and i != (s + 1) % 5]
    # preserve traversal order starting at index 0 like the reference loop
    out = []
    for i in range(5):
        if i == s:
            out.append(merged)
        elif i == (s + 1) % 5:
            continue
        else:
            out.append(p[i])
    return np.asarray(out).reshape(4, 2)


def best_point_order(poly: np.ndarray, ref_poly: np.ndarray) -> np.ndarray:
    """Cyclic shift minimizing the summed squared distance to ref_poly."""
    p = np.asarray(poly, np.float64).reshape(4, 2)
    r = np.asarray(ref_poly, np.float64).reshape(4, 2)
    shifts = [np.roll(p, -k, axis=0) for k in range(4)]
    d = [float(np.sum((s - r) ** 2)) for s in shifts]
    return shifts[int(np.argmin(d))]


class ImgSplit:
    def __init__(
        self,
        basepath: str,
        outpath: str,
        gap: int = 512,
        subsize: int = 1024,
        thresh: float = 0.7,
        choosebestpoint: bool = True,
        ext: str = ".png",
        padding: bool = True,
        num_process: int = 8,
        images_only: bool = False,
    ):
        self.basepath = basepath
        self.outpath = outpath
        self.gap = gap
        self.subsize = subsize
        self.slide = subsize - gap
        self.thresh = thresh
        self.choosebestpoint = choosebestpoint
        self.ext = ext
        self.padding = padding
        self.num_process = num_process
        self.images_only = images_only
        self.imagepath = osp.join(basepath, "images")
        self.labelpath = osp.join(basepath, "labelTxt")
        self.outimagepath = osp.join(outpath, "images")
        self.outlabelpath = osp.join(outpath, "labelTxt")
        os.makedirs(self.outimagepath, exist_ok=True)
        if not images_only:
            os.makedirs(self.outlabelpath, exist_ok=True)

    # ------------------------------------------------------------------
    def _clip_objects(self, objects, left, up, right, down):
        """Clip gt polys to the tile window; returns tile-frame objects."""
        out = []
        for obj in objects:
            poly = np.asarray(obj["poly"], np.float64).reshape(4, 2)
            area = polygon_area(poly)
            if area <= 0:
                continue
            inter = clip_polygon(orient_ccw(poly), (left, up, right, down))
            inter_area = polygon_area(inter)
            half_iou = inter_area / area if area > 0 else 0.0
            if half_iou <= 0:
                continue
            if half_iou >= 1.0 - 1e-9:
                tile_poly = poly - [left, up]
                tile_poly = np.floor(tile_poly)  # reference int-casts coords
                out.append(
                    dict(poly=tile_poly.reshape(-1), name=obj["name"],
                         difficult=obj["difficult"])
                )
                continue
            if len(inter) < 4:
                continue
            if len(inter) == 5:
                inter = reduce_poly5_to_poly4(inter)
            elif len(inter) > 5:
                continue  # reference drops >5-gons
            if self.choosebestpoint:
                inter = best_point_order(inter, poly)
            tile_poly = np.floor(inter - [left, up])
            tile_poly = np.clip(tile_poly, 1, self.subsize)
            difficult = (
                obj["difficult"] if half_iou > self.thresh else "2"
            )
            out.append(
                dict(poly=tile_poly.reshape(-1), name=obj["name"],
                     difficult=difficult)
            )
        return out

    def split_single(self, name: str, rate: float = 1.0):
        img = cv2.imread(osp.join(self.imagepath, name + self.ext))
        if img is None:
            return
        objects = []
        if not self.images_only:
            objects = util.parse_dota_poly(
                osp.join(self.labelpath, name + ".txt")
            )
            for o in objects:
                o["poly"] = np.asarray(o["poly"], np.float64) * rate
        if rate != 1.0:
            img = cv2.resize(
                img, None, fx=rate, fy=rate, interpolation=cv2.INTER_CUBIC
            )
        h, w = img.shape[:2]
        base = f"{name}__{rate}__"
        left = 0
        while left < w:
            if left + self.subsize >= w:
                left = max(w - self.subsize, 0)
            up = 0
            while up < h:
                if up + self.subsize >= h:
                    up = max(h - self.subsize, 0)
                right = min(left + self.subsize, w - 1)
                down = min(up + self.subsize, h - 1)
                subname = f"{base}{left}___{up}"
                self._save_patch(img, objects, subname, left, up, right, down)
                if up + self.subsize >= h:
                    break
                up += self.slide
            if left + self.subsize >= w:
                break
            left += self.slide

    def _save_patch(self, img, objects, subname, left, up, right, down):
        if not self.images_only:
            tile_objs = self._clip_objects(objects, left, up, right, down)
            util.write_dota_poly(
                osp.join(self.outlabelpath, subname + ".txt"), tile_objs
            )
        sub = img[up : up + self.subsize, left : left + self.subsize]
        if self.padding:
            canvas = np.zeros(
                (self.subsize, self.subsize, 3), dtype=img.dtype
            )
            canvas[: sub.shape[0], : sub.shape[1]] = sub
            sub = canvas
        cv2.imwrite(osp.join(self.outimagepath, subname + self.ext), sub)

    def splitdata(self, rate: float = 1.0):
        names = [
            util.basename_noext(p)
            for p in util.list_files(self.imagepath, self.ext)
            if util.basename_noext(p) != "Thumbs"
        ]
        if self.num_process <= 1:
            for n in names:
                self.split_single(n, rate)
        else:
            with Pool(self.num_process) as pool:
                pool.map(partial(_split_worker, self, rate), names)


def _split_worker(split: ImgSplit, rate: float, name: str):
    split.split_single(name, rate)


class SplitOnlyImage(ImgSplit):
    """Image-only tiling for the test split (SplitOnlyImage_multi_process.py)."""

    def __init__(self, basepath, outpath, **kw):
        kw["images_only"] = True
        super().__init__(basepath, outpath, **kw)
