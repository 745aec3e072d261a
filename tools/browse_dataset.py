#!/usr/bin/env python
"""Visualize pipeline output: images with gt polys drawn.

Reference analogue: tools/browse_dataset.py + PolyImgPlot
(poly_transforms.py:1025).  Writes annotated pngs to --output-dir.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import cv2
import numpy as np

from orientedreppoints_tpu.utils import Config, builder


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--split", default="train")
    p.add_argument("--output-dir", default="work_dirs/browse")
    p.add_argument("--num", type=int, default=10)
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    ds = builder.build_dataset(cfg.data[args.split])
    os.makedirs(args.output_dir, exist_ok=True)
    norm = cfg.img_norm_cfg
    mean = np.asarray(norm["mean"], np.float32)
    std = np.asarray(norm["std"], np.float32)
    n = 0
    for i in range(len(ds)):
        s = ds[i]
        if s is None:
            continue
        img = s["img"]
        if img.dtype != np.uint8:  # undo Normalize for display
            img = img * std + mean
            if norm.get("to_rgb", True):
                img = img[..., ::-1]
            img = np.clip(img, 0, 255).astype(np.uint8)
        img = np.ascontiguousarray(img)
        for poly, lab in zip(s.get("gt_bboxes", []), s.get("gt_labels", [])):
            pts = np.round(poly.reshape(4, 2)).astype(np.int32)
            cv2.polylines(img, [pts], True, (0, 255, 0), 2)
            cv2.putText(img, str(int(lab)), tuple(pts[0]),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 0, 255), 1)
        out = osp.join(args.output_dir, f"{i:05d}.png")
        cv2.imwrite(out, img)
        n += 1
        if n >= args.num:
            break
    print(f"wrote {n} images to {args.output_dir}")


if __name__ == "__main__":
    main()
