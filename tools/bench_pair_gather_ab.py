#!/usr/bin/env python
"""Same-process interleaved A/B of the paired-DCN forward gather layout
on INFERENCE: 8 narrow (N, C) corner takes (default) vs 4 channel-paired
(N, 2C) takes (ORP_PAIR_GATHER=cat, ops/deform_conv.py _pair_corners).

Half the gather rows at double the row width; gather throughput rises
with row width (DESIGN.md s8: ~30 GB/s @512 B -> ~70 GB/s @2 KB), so at
C=256 bf16 the paired form is the one credible remaining lever on the
~35 ms head-DCN floor.  Numerics are identical (test_deform_conv.py::
test_pair_cat_gather_matches_narrow).
"""
import os
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

B = 4


def build(name, env):
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        model = OrientedRepPointsDetector(
            depth=50, num_classes=16, dtype=jnp.bfloat16)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 1024, 1024, 3), jnp.float32))

        @jax.jit
        def infer(v, imgs):
            return decode_detections(
                model.apply(v, imgs), nms_pre=2000, score_thr=0.05,
                iou_thr=0.4, max_per_img=2000)

        r = np.random.RandomState(0)
        xs = [jnp.asarray(r.rand(B, 1024, 1024, 3).astype(np.float32))
              for _ in range(3)]
        t0 = time.time()
        out = infer(variables, xs[0])
        jnp.sum(out[0]).item()
        print(f"[{name}] compile+first: {time.time()-t0:.1f} s", flush=True)
        return {"name": name, "infer": infer, "v": variables, "xs": xs}
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


variants = [build("narrow", {}), build("cat", {"ORP_PAIR_GATHER": "cat"})]
for v in variants:  # warm
    for x in v["xs"]:
        out = v["infer"](v["v"], x)
    jnp.sum(out[0]).item()

times = {v["name"]: [] for v in variants}
for r_ in range(8):
    for v in variants:
        t0 = time.time()
        for x in v["xs"]:
            out = v["infer"](v["v"], x)
        jnp.sum(out[0]).item()
        times[v["name"]].append((time.time() - t0) / len(v["xs"]))
    print(f"round {r_}: " + "  ".join(
        f"{n}={times[n][-1]*1e3:.1f}ms" for n in times), flush=True)

print("\n== medians ==")
for n, ts in times.items():
    med = float(np.median(ts))
    print(f"{n:6s} {med*1e3:7.1f} ms/batch   {B/med:6.2f} patches/s/chip")
