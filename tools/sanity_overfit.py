#!/usr/bin/env python
"""Training sanity check: overfit a tiny synthetic oriented-box dataset and
report detection quality (the no-real-data analogue of the reference's
"train on DOTA, watch mAP" loop).

Run on TPU:  python tools/sanity_overfit.py [--steps 300]
Success criterion: loss decreases substantially AND the trained model's
detections on the train images reach high IoU with the synthetic gt.
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--img", type=int, default=256)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--lr", type=float, default=0.005)
    p.add_argument("--backbone", default="r18",
                   choices=["r18", "r50", "r101", "hrnet", "ssd_vgg",
                            "swin"],
                   help="backbone family to overfit — cheap trains-at-all "
                        "evidence for every model family, not just the "
                        "benchmarked R-18/R-50/Swin")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/orp_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from orientedreppoints_tpu.core.loss_head import LossConfig
    from orientedreppoints_tpu.devkit.polygon import poly_iou
    from orientedreppoints_tpu.models import (
        OrientedRepPointsDetector, decode_detections,
    )
    from orientedreppoints_tpu.parallel import (
        TrainState, build_optimizer, make_train_step,
    )

    IMG, B = args.img, args.batch
    rng = np.random.RandomState(0)

    # fixed synthetic scenes: bright rotated rectangles on noise
    gts, imgs = [], []
    for i in range(B):
        img = rng.rand(IMG, IMG, 3).astype(np.float32) * 0.3
        polys = []
        for j in range(3):
            cx, cy = rng.rand(2) * (IMG - 120) + 60
            w, h = rng.rand() * 40 + 30, rng.rand() * 20 + 12
            a = rng.rand() * np.pi
            c, s = np.cos(a), np.sin(a)
            r = (np.array([[-w/2, -h/2], [w/2, -h/2], [w/2, h/2], [-w/2, h/2]])
                 @ [[c, s], [-s, c]]) + [cx, cy]
            polys.append(r.reshape(-1))
            import cv2

            cv2.fillPoly(img, [np.round(r).astype(np.int32)],
                         (1.5 + 0.5 * j, 2.0, 1.0))
        gts.append(np.array(polys, np.float32))
        imgs.append(img)
    gt_polys = np.zeros((B, 8, 8), np.float32)
    gt_labels = np.zeros((B, 8), np.int32)
    gt_valid = np.zeros((B, 8), bool)
    for i in range(B):
        n = len(gts[i])
        gt_polys[i, :n] = gts[i]
        gt_labels[i, :n] = 1
        gt_valid[i, :n] = True
    batch = {
        "images": jnp.asarray(np.stack(imgs)),
        "gt_polys": jnp.asarray(gt_polys),
        "gt_labels": jnp.asarray(gt_labels),
        "gt_valid": jnp.asarray(gt_valid),
        "img_hw": jnp.full((B, 2), IMG, jnp.int32),
    }

    bb = {
        "r18": dict(depth=18),
        "r50": dict(depth=50),
        "r101": dict(depth=101),
        "hrnet": dict(backbone_type="hrnet"),
        "ssd_vgg": dict(backbone_type="ssd_vgg"),
        "swin": dict(backbone_type="swin"),
    }[args.backbone]
    model = OrientedRepPointsDetector(num_classes=16, dtype=jnp.bfloat16,
                                      **bb)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    )
    tx = build_optimizer(variables["params"], lambda s: args.lr)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]), tx=tx,
    )
    step_fn = make_train_step(model, LossConfig(max_pos=64))

    t0 = time.time()
    first = None
    for it in range(args.steps):
        state, losses = step_fn(state, batch)
        if it % 50 == 0 or it == args.steps - 1:
            lt = float(losses["loss_total"])
            if first is None:
                first = lt
            print(f"step {it}: loss {lt:.4f} num_pos "
                  f"{float(losses['num_pos']):.0f} ({time.time()-t0:.0f}s)")
    final = float(losses["loss_total"])

    @jax.jit
    def infer(v, x):
        return decode_detections(
            model.apply(v, x), nms_pre=500, score_thr=0.3, iou_thr=0.4,
            max_per_img=20,
        )

    dets, labels, valid = infer(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["images"],
    )
    dets, valid = np.asarray(dets), np.asarray(valid)
    matched = total = 0
    for i in range(B):
        for g in gts[i]:
            total += 1
            best = 0.0
            for d in dets[i][valid[i]]:
                best = max(best, poly_iou(g, d[-9:-1]))
            matched += best > 0.5
    recall = matched / max(total, 1)
    print(f"loss {first:.3f} -> {final:.3f}; overfit recall@0.5 = "
          f"{matched}/{total} = {recall:.2f}")
    ok = final < first * 0.7 and recall >= 0.5
    print("SANITY", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
