#!/usr/bin/env python
"""Stage-by-stage inference timing on the real chip (R-50 @1024², B=4).

Times nested prefixes of the pipeline (backbone → +fpn → +head towers →
+DCN/head → +decode → +NMS) with the chained lax.map + scalar-fetch
pattern (axon relay: block_until_ready does not block; warm and timed
inputs are disjoint so the dispatch cache cannot serve the timed pass).
"""

from __future__ import annotations

import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

BATCH = 4
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/orp_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from flax import linen as nn

    from orientedreppoints_tpu.models import (
        OrientedRepPointsDetector, decode_detections,
    )
    from orientedreppoints_tpu.models.detector import decode_no_nms
    from orientedreppoints_tpu.models.resnet import ResNet
    from orientedreppoints_tpu.models.fpn import FPN
    from orientedreppoints_tpu.models.head import OrientedRepPointsHead

    dtype = jnp.bfloat16
    model = OrientedRepPointsDetector(depth=50, num_classes=16, dtype=dtype)
    rng = np.random.RandomState(0)
    init_imgs = jnp.zeros((BATCH, 1024, 1024, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), init_imgs)

    bb = ResNet(depth=50, dtype=dtype)
    bb_vars = {k: v["backbone"] for k, v in variables.items()}

    class BBFPN(nn.Module):
        @nn.compact
        def __call__(self, x):
            f = ResNet(depth=50, dtype=dtype, name="backbone")(x)
            return FPN(out_channels=256, num_outs=5, start_level=1,
                       add_extra_convs=True, dtype=dtype, name="neck")(f)

    bf = BBFPN()
    bf_vars = {k: {n: v[n] for n in ("backbone", "neck") if n in v}
               for k, v in variables.items()}

    stages = {}

    def reduce_tree(t):
        return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(t))

    stages["backbone"] = lambda x: reduce_tree(bb.apply(bb_vars, x))
    stages["backbone+fpn"] = lambda x: reduce_tree(bf.apply(bf_vars, x))
    stages["fwd(full head)"] = lambda x: reduce_tree(model.apply(variables, x))

    def fwd_decode_no_nms(x):
        outs = model.apply(variables, x)
        return reduce_tree(decode_no_nms(outs))

    stages["fwd+decode(no nms)"] = fwd_decode_no_nms

    def full(x):
        outs = model.apply(variables, x)
        d, l, v = decode_detections(outs, nms_pre=2000, score_thr=0.05,
                                    iou_thr=0.4, max_per_img=2000)
        return jnp.sum(d) + jnp.sum(l) + jnp.sum(v)

    stages["full(+nms)"] = full

    warm = jax.device_put(jnp.asarray(
        rng.rand(ITERS, BATCH, 1024, 1024, 3).astype(np.float32)))
    timed = jax.device_put(jnp.asarray(
        rng.rand(ITERS, BATCH, 1024, 1024, 3).astype(np.float32)))

    prev = 0.0
    for name, fn in stages.items():
        runner = jax.jit(lambda xs, fn=fn: jnp.sum(
            jax.lax.map(lambda x: fn(x), xs)))
        float(runner(warm))
        t0 = time.time()
        float(runner(timed))
        dt = (time.time() - t0) / ITERS * 1000
        print(f"{name:24s} {dt:8.2f} ms/batch  (+{dt - prev:6.2f})")
        prev = dt


if __name__ == "__main__":
    main()
