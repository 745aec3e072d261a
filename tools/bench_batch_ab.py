#!/usr/bin/env python
"""Same-process interleaved A/B of inference batch size (B4 vs B8) for
the bench.py graph (lax.map-chained fwd+decode+rNMS, one scalar fetch).

bench.py's headline is throughput, so the batch is a free parameter;
this measures whether B8 amortizes per-step overhead enough to beat B4
before changing bench.py's BATCH (which invalidates the driver's warm
compile cache — only worth it for a real win).
"""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/orp_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from orientedreppoints_tpu.models import (
    OrientedRepPointsDetector, decode_detections)

ITERS = 6
BATCHES = [int(b) for b in (sys.argv[1:] or ["4", "8"])]


def build(batch):
    model = OrientedRepPointsDetector(
        depth=50, num_classes=16, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 1024, 1024, 3), jnp.float32))

    def infer_one(v, x):
        outs = model.apply(v, x)
        dets, labels, valid = decode_detections(
            outs, nms_pre=2000, score_thr=0.05, iou_thr=0.4, max_per_img=2000)
        return jnp.sum(dets) + jnp.sum(labels) + jnp.sum(valid)

    @jax.jit
    def infer_many(v, xs):
        return jnp.sum(jax.lax.map(lambda x: infer_one(v, x), xs))

    r = np.random.RandomState(batch)
    warm = jax.device_put(jnp.asarray(
        r.rand(ITERS, batch, 1024, 1024, 3).astype(np.float32)))
    timed = [jax.device_put(jnp.asarray(
        r.rand(ITERS, batch, 1024, 1024, 3).astype(np.float32)))
        for _ in range(2)]
    t0 = time.time()
    float(infer_many(variables, warm))
    print(f"[B{batch}] compile+first: {time.time()-t0:.1f} s", flush=True)
    return {"b": batch, "fn": infer_many, "v": variables, "timed": timed}


variants = [build(b) for b in BATCHES]
times = {v["b"]: [] for v in variants}
for rd in range(6):
    for v in variants:
        x = v["timed"][rd % 2]
        t0 = time.time()
        float(v["fn"](v["v"], x))
        dt = time.time() - t0
        times[v["b"]].append(v["b"] * ITERS / dt)
    print("round %d: " % rd + "  ".join(
        f"B{b}={ts[-1]:.2f}p/s" for b, ts in times.items()), flush=True)

print("\n== medians ==")
for b, ts in times.items():
    print(f"B{b}: {float(np.median(ts)):6.2f} patches/s/chip")
