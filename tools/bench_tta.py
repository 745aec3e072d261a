#!/usr/bin/env python
"""Time the multi-scale x flip TTA inference path on the TPU chip.

Measures the jitted aug-fused graph from tools/test.py --ms_tta
(decode_no_nms per aug + merge_aug_and_nms, one compiled program) on
R-50 @1024^2 with the reference's 3-scale x 2-flip recipe, plus the
host-side aug canvas preparation cost, and writes TTA_BENCH.json.

Reference anchor: aug_test (mmdet orientedreppoints_detector.py:111-144)
driven by MultiScaleFlipAug; the reference has no published TTA
throughput number.
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
    OrientedRepPointsDetector, decode_no_nms, merge_aug_and_nms,
)

B = 2
SCALES = (0.5, 1.0, 1.5)
FLIPS = (False, True)
TTA_AUGS = [(r, f) for r in SCALES for f in FLIPS]
TC = dict(nms_pre=2000, score_thr=0.05, iou_thr=0.4, max_per_img=2000)

model = OrientedRepPointsDetector(depth=50, num_classes=16,
                                  dtype=jnp.bfloat16)
variables = jax.jit(model.init)(
    jax.random.PRNGKey(0), jnp.zeros((1, 1024, 1024, 3), jnp.float32))

num_augs = len(TTA_AUGS)
aug_flips = [f for _, f in TTA_AUGS]


@jax.jit
def infer_tta(v, imgs_augs, sf_augs):
    """Same graph as tools/test.py --ms_tta: (A, B, H, W, 3) canvases."""
    boxes_a, scores_a = [], []
    for ai, flip in enumerate(aug_flips):
        x = imgs_augs[ai]
        if flip:
            x = x[:, :, ::-1]
        b, s = decode_no_nms(model.apply(v, x), nms_pre=TC["nms_pre"])
        boxes_a.append(b)
        scores_a.append(s)
    boxes_all = jnp.stack(boxes_a, axis=1)
    scores_all = jnp.stack(scores_a, axis=1)
    img_shape = (imgs_augs.shape[2], imgs_augs.shape[3])

    def per_image(args_):
        bb, ss, sf = args_
        return merge_aug_and_nms(
            [bb[a] for a in range(num_augs)],
            [ss[a] for a in range(num_augs)],
            aug_flips, img_shape,
            [sf[a] for a in range(num_augs)],
            score_thr=TC["score_thr"], iou_thr=TC["iou_thr"],
            max_per_img=TC["max_per_img"],
        )

    return jax.lax.map(per_image, (boxes_all, scores_all, sf_augs.T))


def host_prepare(imgs):
    """cv2 aug canvas prep exactly as tools/test.py does it."""
    import cv2

    bsz, ch, cw = imgs.shape[0], imgs.shape[1], imgs.shape[2]
    imgs_augs = np.zeros((num_augs, bsz, ch, cw, 3), np.float32)
    sf_augs = np.ones((num_augs, bsz), np.float32)
    for ai, (r, _) in enumerate(TTA_AUGS):
        for bi in range(bsz):
            if r == 1.0:
                imgs_augs[ai, bi] = imgs[bi]
            else:
                rh, rw = int(round(ch * r)), int(round(cw * r))
                resized = cv2.resize(imgs[bi], (rw, rh),
                                     interpolation=cv2.INTER_LINEAR)
                imgs_augs[ai, bi, :min(rh, ch), :min(rw, cw)] = \
                    resized[:ch, :cw]
                sf_augs[ai, bi] = r
    return imgs_augs, sf_augs


rng = np.random.RandomState(0)
host_batches = [rng.rand(B, 1024, 1024, 3).astype(np.float32)
                for _ in range(5)]

t0 = time.time()
prep = [host_prepare(h) for h in host_batches]
host_ms = (time.time() - t0) / len(prep) * 1e3

dev = [(jnp.asarray(a), jnp.asarray(s)) for a, s in prep]

t0 = time.time()
out = infer_tta(variables, *dev[0])
jnp.sum(out[0]).item()
print(f"compile+first: {time.time()-t0:.1f}s")

for a, s in dev[1:3]:
    out = infer_tta(variables, a, s)
jnp.sum(out[0]).item()

t0 = time.time()
for a, s in dev[3:]:
    out = infer_tta(variables, a, s)
jnp.sum(out[0]).item()
dev_ms = (time.time() - t0) / 2 * 1e3

per_img = dev_ms / B
print(f"device TTA ({num_augs} augs): {dev_ms:.0f} ms/batch @B={B} "
      f"-> {1e3/per_img:.1f} patches/s/chip; host aug prep {host_ms:.0f} "
      f"ms/batch (overlappable with device work)")

import json

out = {
    "metric": "tta_throughput_r50_1024_3scale_flip",
    "value": round(1e3 / per_img, 2),
    "unit": "patches/s/chip",
    "augs": num_augs,
    "device_ms_per_batch": round(dev_ms, 1),
    "host_prep_ms_per_batch": round(host_ms, 1),
    "batch": B,
}
print(json.dumps(out))
with open(osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                   "TTA_BENCH.json"), "w") as f:
    json.dump(out, f, indent=2)
