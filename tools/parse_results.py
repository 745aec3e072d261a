#!/usr/bin/env python
"""Convert saved raw results (.npz from tools/test.py --out) into per-class
DOTA Task1 txts and optionally run the cross-tile merge.

Reference analogue: tools/parse_pkl/parse_pkl_mege_results_for_dota_evaluation.py
(pkl -> Task1 txt -> mergebypoly).
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

from orientedreppoints_tpu.devkit.dota_utils import DOTA10_CLASSES
from orientedreppoints_tpu.devkit.result_merge import (
    merge_by_poly,
    write_task1_results,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("npz", help="results .npz (keys '<img>|<class_idx>')")
    p.add_argument("out_dir", help="dir for per-class Task1 txts")
    p.add_argument("--merge_dir", help="optional cross-tile merged output")
    p.add_argument("--classes", nargs="+", default=list(DOTA10_CLASSES))
    args = p.parse_args()

    data = np.load(args.npz)
    results: dict[str, list] = {}
    nc = len(args.classes)
    for key in data.files:
        img, ci = key.rsplit("|", 1)
        results.setdefault(img, [np.zeros((0, 9))] * nc)[int(ci)] = data[key]
    write_task1_results(results, args.classes, args.out_dir)
    print(f"wrote Task1 txts for {len(results)} tiles to {args.out_dir}")
    if args.merge_dir:
        merge_by_poly(args.out_dir, args.merge_dir)
        print("merged to", args.merge_dir)


if __name__ == "__main__":
    main()
