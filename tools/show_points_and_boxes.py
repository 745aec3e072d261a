#!/usr/bin/env python
"""Visualize learned RepPoints and decoded oriented boxes on images.

Reference analogue: tools/parse_pkl/show_learning_points_and_boxes.py
(README:49).  Runs inference and draws the 9 adaptive points (circles) and
the decoded min-area-rect polygon per kept detection.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import cv2
import numpy as np

from orientedreppoints_tpu.apis import init_detector, run_inference
from orientedreppoints_tpu.utils import builder

_PALETTE = [
    (54, 67, 244), (99, 30, 233), (176, 39, 156), (183, 58, 103),
    (181, 81, 63), (243, 150, 33), (212, 188, 0), (136, 150, 0),
    (80, 175, 76), (74, 195, 139), (57, 220, 205), (59, 235, 255),
    (0, 152, 255), (34, 87, 255), (72, 85, 121),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint")
    p.add_argument("--split", default="test")
    p.add_argument("--output-dir", default="work_dirs/show_points")
    p.add_argument("--num", type=int, default=10)
    p.add_argument("--score-thr", type=float, default=0.3)
    args = p.parse_args()

    import jax.numpy as jnp
    import jax

    from orientedreppoints_tpu.models import decode_detections

    model, variables, cfg = init_detector(args.config, args.checkpoint)
    ds = builder.build_dataset({**cfg.data[args.split], "test_mode": True})
    tpu = cfg.get("tpu", {})
    canvas = tuple(tpu.get("canvas_buckets", [(1344, 1344)])[-1])
    os.makedirs(args.output_dir, exist_ok=True)

    @jax.jit
    def infer(v, imgs):
        outs = model.apply(v, imgs)
        return decode_detections(
            outs, nms_pre=cfg.test_cfg["nms_pre"],
            score_thr=cfg.test_cfg["score_thr"],
            iou_thr=cfg.test_cfg["nms"]["iou_thr"],
            max_per_img=cfg.test_cfg["max_per_img"],
            with_reppoints=True,
        )

    norm = cfg.img_norm_cfg
    mean = np.asarray(norm["mean"], np.float32)
    std = np.asarray(norm["std"], np.float32)
    for i in range(min(args.num, len(ds))):
        s = ds[i]
        img = s["img"]
        cimg = np.zeros(canvas + (3,), np.float32)
        cimg[: img.shape[0], : img.shape[1]] = img
        dets, labels, valid = infer(variables, jnp.asarray(cimg[None]))
        dets, labels, valid = map(np.asarray, (dets, labels, valid))
        vis = img * std + mean
        if norm.get("to_rgb", True):
            vis = vis[..., ::-1]
        vis = np.ascontiguousarray(np.clip(vis, 0, 255).astype(np.uint8))
        for d, lab, ok in zip(dets[0], labels[0], valid[0]):
            if not ok or d[-1] < args.score_thr:
                continue
            color = _PALETTE[int(lab) % len(_PALETTE)]
            poly = np.round(d[18:26].reshape(4, 2)).astype(np.int32)
            cv2.polylines(vis, [poly], True, color, 2)
            for px, py in d[:18].reshape(9, 2):
                cv2.circle(vis, (int(px), int(py)), 2, color, -1)
            cv2.putText(vis, f"{d[-1]:.2f}", tuple(poly[0]),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.4, color, 1)
        out = osp.join(args.output_dir,
                       osp.splitext(s["img_info"]["file_name"])[0] + ".png")
        cv2.imwrite(out, vis)
        print("wrote", out)


if __name__ == "__main__":
    main()
