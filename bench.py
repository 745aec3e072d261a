#!/usr/bin/env python
"""Benchmark: R-50 OrientedRepPoints 1024x1024-patch inference throughput
on one TPU chip (forward + decode + rotated NMS, end-to-end on device).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the reference V100 mmdetection baseline of
~12 patches/s/GPU for R-50 single-stage oriented detectors at 1024^2
(mmdet model-zoo inference numbers for RetinaNet/RepPoints-class models;
the reference repo publishes no throughput, see BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np

V100_BASELINE_PATCHES_PER_S = 12.0
BATCH = 4
WARMUP = 3
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/orp_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from orientedreppoints_tpu.models import (
        OrientedRepPointsDetector, decode_detections,
    )

    model = OrientedRepPointsDetector(depth=50, num_classes=16,
                                      dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    init_imgs = jnp.zeros((BATCH, 1024, 1024, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), init_imgs)

    def infer_one(v, x):
        outs = model.apply(v, x)
        dets, labels, valid = decode_detections(
            outs, nms_pre=2000, score_thr=0.05, iou_thr=0.4, max_per_img=2000
        )
        return jnp.sum(dets) + jnp.sum(labels) + jnp.sum(valid)

    @jax.jit
    def infer_many(v, xs):
        # chain all iterations on device; ONE scalar fetch at the end forces
        # completion, so neither async dispatch nor per-call host round-trips
        # pollute the timing
        return jnp.sum(jax.lax.map(lambda x: infer_one(v, x), xs))

    batches = jnp.asarray(
        rng.rand(ITERS, BATCH, 1024, 1024, 3).astype(np.float32)
    )
    float(infer_many(variables, batches))  # compile + warm (same shape)

    t0 = time.time()
    float(infer_many(variables, batches))
    dt = time.time() - t0
    patches_per_s = BATCH * ITERS / dt

    print(json.dumps({
        "metric": "r50_1024px_inference_throughput",
        "value": round(patches_per_s, 2),
        "unit": "patches/s/chip",
        "vs_baseline": round(patches_per_s / V100_BASELINE_PATCHES_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
