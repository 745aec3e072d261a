#!/usr/bin/env python
"""Export the inference graph to portable StableHLO.

Reference analogue: tools/pytorch2onnx.py — the JAX-native equivalent is
jax.export (StableHLO), loadable from any XLA-compatible runtime.
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("out", help="output .stablehlo path")
    p.add_argument("--checkpoint")
    p.add_argument("--batch", type=int, default=1)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from orientedreppoints_tpu.apis import init_detector
    from orientedreppoints_tpu.models import decode_detections

    model, variables, cfg = init_detector(args.config, args.checkpoint)
    tpu = cfg.get("tpu", {})
    canvas = tuple(tpu.get("canvas_buckets", [(1344, 1344)])[-1])
    tc = cfg.test_cfg

    def infer(v, x):
        outs = model.apply(v, x)
        return decode_detections(
            outs, nms_pre=tc["nms_pre"], score_thr=tc["score_thr"],
            iou_thr=tc["nms"]["iou_thr"], max_per_img=tc["max_per_img"],
        )

    x_spec = jax.ShapeDtypeStruct((args.batch,) + canvas + (3,), jnp.float32)
    v_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables
    )
    exported = jexport.export(jax.jit(infer))(v_spec, x_spec)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {len(blob)/1e6:.1f} MB StableHLO to {args.out}")


if __name__ == "__main__":
    main()
