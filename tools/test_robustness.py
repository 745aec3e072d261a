#!/usr/bin/env python
"""Corruption-robustness benchmark.

Reference analogue: tools/test_robustness.py + robustness_eval.py
(imagecorruptions suite).  Runs inference with each corruption/severity
applied after loading and reports tile-level oriented mAP per setting plus
the mean (mPC-style summary).
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

from orientedreppoints_tpu.apis import evaluate_results, run_inference, init_detector
from orientedreppoints_tpu.data.corruptions import CORRUPTIONS, corrupt
from orientedreppoints_tpu.utils import builder


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint")
    p.add_argument("--corruptions", nargs="+", default=list(CORRUPTIONS))
    p.add_argument("--severities", nargs="+", type=int, default=[1, 3, 5])
    p.add_argument("--max_images", type=int, default=100)
    args = p.parse_args()

    model, variables, cfg = init_detector(args.config, args.checkpoint)
    tpu = cfg.get("tpu", {})
    canvas = tuple(tpu.get("canvas_buckets", [(1344, 1344)])[-1])

    summary = {}
    for corr in args.corruptions:
        for sev in args.severities:
            ds = builder.build_dataset({**cfg.data["val"], "test_mode": True})
            base_pipeline = ds.pipeline

            def corrupted_pipeline(results, _c=corr, _s=sev, _p=base_pipeline):
                out = _p(results)
                if out is not None:
                    img = out["img"]
                    # corrupt in uint8 space when normalized already
                    if img.dtype != np.uint8:
                        return out  # corruption applied pre-normalize below
                return out

            # simplest correct wiring: corrupt right after load by wrapping
            # the dataset getter
            orig_getitem = ds.__class__.__getitem__

            def getitem(self, idx, _c=corr, _s=sev):
                r = self.get_raw(idx)
                from orientedreppoints_tpu.data.pipelines import (
                    LoadImageFromFile,
                )

                r = LoadImageFromFile()(r)
                r["img"] = corrupt(r["img"], _c, _s)
                # continue with the remaining pipeline stages
                for stage_cfg in cfg.data["val"]["pipeline"][1:]:
                    from orientedreppoints_tpu.data.pipelines import PIPELINES

                    c2 = dict(stage_cfg)
                    t = c2.pop("type")
                    if t in ("LoadAnnotations",):
                        continue
                    r = PIPELINES[t](**c2)(r)
                    if r is None:
                        return None
                return r

            ds.__class__.__getitem__ = getitem
            try:
                results = run_inference(
                    model, variables, ds, cfg.test_cfg, canvas=canvas,
                    max_images=args.max_images, num_fg=len(ds.CLASSES),
                )
                mAP, _ = evaluate_results(results, ds)
            finally:
                ds.__class__.__getitem__ = orig_getitem
            summary[f"{corr}@{sev}"] = round(mAP, 4)
            print(f"{corr} severity {sev}: mAP {mAP:.4f}")
    mean = float(np.mean(list(summary.values()))) if summary else 0.0
    print(json.dumps({"per_setting": summary, "mPC": round(mean, 4)}))


if __name__ == "__main__":
    main()
