#!/usr/bin/env python
"""Corruption-robustness benchmark (mPC).

Reference analogue: tools/test_robustness.py + tools/robustness_eval.py.
Like the reference (test_robustness.py:317-336), each (corruption,
severity) setting is evaluated by inserting a `Corrupt` pipeline stage
right after image load; severity 0 is the clean baseline evaluated once.
The summary follows robustness_eval.py:74-92:

  P   = clean mAP (severity 0)
  mPC = mean mAP over all corruptions x severities >= 1
  rPC = mPC / P

Corruptions come from data/corruptions.py (the imagecorruptions-equivalent
library; seeded, so results are reproducible).

Usage (chip):
  python tools/test_robustness.py CONFIG --checkpoint work_dirs/x/ckpts \
      --corruptions gaussian_noise motion_blur pixelate --severities 1 3 5 \
      --out ROBUST_BENCH.json
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import os

import jax

# same CPU-forcing contract as tools/test.py (the axon site hook overrides
# the env var)
if os.environ.get("ORP_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["ORP_PLATFORM"])
if os.environ.get("ORP_JAX_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["ORP_JAX_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np

from orientedreppoints_tpu.apis import (
    evaluate_results, init_detector, run_inference,
)
from orientedreppoints_tpu.data.corruptions import CORRUPTIONS
from orientedreppoints_tpu.utils import builder


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint")
    p.add_argument("--corruptions", nargs="+", default=list(CORRUPTIONS))
    p.add_argument("--severities", nargs="+", type=int, default=[1, 3, 5],
                   help="severities >= 1; the clean baseline (severity 0) "
                        "is always evaluated once, like the reference")
    p.add_argument("--max_images", type=int, default=100)
    p.add_argument("--out", help="path for the JSON artifact")
    p.add_argument("--data_root",
                   help="rewrite the val split's ann_file/img_prefix onto "
                        "this root (<root>/val_split/{test.json,images/}, "
                        "the tools/synth_benchmark.py work_dir layout) — "
                        "lets one config score checkpoints trained into "
                        "any work_dir")
    return p.parse_args()


def main():
    args = parse_args()
    unknown = set(args.corruptions) - set(CORRUPTIONS)
    assert not unknown, f"unknown corruptions: {sorted(unknown)}"

    model, variables, cfg = init_detector(args.config, args.checkpoint)
    tpu = cfg.get("tpu", {})
    canvas = tuple(tpu.get("canvas_buckets", [(1344, 1344)])[-1])
    if args.data_root:
        for split in ("val", "test"):
            if split in cfg.data:
                cfg.data[split]["ann_file"] = osp.join(
                    args.data_root, "val_split", "test.json")
                cfg.data[split]["img_prefix"] = osp.join(
                    args.data_root, "val_split", "images/")

    def eval_setting(corr: str | None, sev: int) -> float:
        pipeline = [dict(s) for s in cfg.data["val"]["pipeline"]]
        if corr is not None and sev > 0:
            # insert right after the load stage (reference
            # test_robustness.py:326-330 uses position 1)
            pipeline.insert(
                1, dict(type="Corrupt", corruption=corr, severity=sev))
        ds = builder.build_dataset(
            {**cfg.data["val"], "pipeline": pipeline, "test_mode": True})
        results = run_inference(
            model, variables, ds, cfg.test_cfg, canvas=canvas,
            max_images=args.max_images, num_fg=len(ds.CLASSES),
        )
        mAP, _ = evaluate_results(results, ds)
        return float(mAP)

    P = eval_setting(None, 0)
    print(f"clean baseline P: mAP {P:.4f}", flush=True)
    per_setting = {}
    for corr in args.corruptions:
        for sev in args.severities:
            assert sev >= 1, "severities must be >= 1 (0 = clean baseline)"
            m = eval_setting(corr, sev)
            per_setting[f"{corr}@{sev}"] = round(m, 4)
            print(f"{corr} severity {sev}: mAP {m:.4f}", flush=True)

    mPC = float(np.mean(list(per_setting.values()))) if per_setting else 0.0
    out = {
        "metric": "robustness_mPC",
        "P": round(P, 4),
        "mPC": round(mPC, 4),
        "rPC": round(mPC / P, 4) if P > 0 else 0.0,
        "per_setting": per_setting,
        "max_images": args.max_images,
    }
    print(json.dumps(out), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
