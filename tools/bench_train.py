#!/usr/bin/env python
"""Batch-scaling sweep of the R-50 1024^2 full-APAA train step on the
TPU chip.

The reference trains at 2 img/GPU (configs/dota/orientedrepoints_r50_demo
data.imgs_per_gpu=2); B2 mirrors that, but nothing forces a TPU chip to
stop there — larger batches amortize the fixed per-step costs the stage
breakdown itemizes (docs/DESIGN.md §8-§13).  This sweep measures step
time, img/s/chip and MFU at each batch size (ORP_BENCH_BATCHES to
override, default 2,4,8) and records the whole curve plus the best point
in TRAIN_BENCH.json.
"""
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/orp_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from orientedreppoints_tpu.core.loss_head import LossConfig
from orientedreppoints_tpu.models import OrientedRepPointsDetector
from orientedreppoints_tpu.parallel import (
    TrainState, build_optimizer, lr_schedule, make_train_step)

BATCHES = [int(b) for b in
           os.environ.get("ORP_BENCH_BATCHES", "2,4,8").split(",")]
PEAK = 197e12  # v5e bf16 peak TFLOP/s

rng = np.random.RandomState(0)
model = OrientedRepPointsDetector(depth=50, num_classes=16, dtype=jnp.bfloat16)
variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                jnp.zeros((1, 1024, 1024, 3), jnp.float32))
params = variables["params"]
tx = build_optimizer(params, lr_schedule(iters_per_epoch=100))
# max_pos tracks the adopted flagship train config (synth_r50_1024_hard_aug:
# 2048 since the unbiased-cap change; measured refine positives ~2k/sample
# at 1024^2 mosaic density)
cfg = LossConfig(max_pos=2048)


def batch(seed, b):
    r = np.random.RandomState(seed)
    gt = np.zeros((b, 64, 8), np.float32); lb = np.zeros((b, 64), np.int32)
    gv = np.zeros((b, 64), bool)
    for i in range(b):
        for j in range(40):
            cx, cy = r.rand(2) * 900 + 60
            w, h = r.rand(2) * 80 + 12
            a = r.rand() * np.pi
            c, s = np.cos(a), np.sin(a)
            rot = np.array([[-w/2,-h/2],[w/2,-h/2],[w/2,h/2],[-w/2,h/2]])
            gt[i, j] = ((rot @ [[c,s],[-s,c]]) + [cx, cy]).reshape(-1)
            lb[i, j] = r.randint(1, 16); gv[i, j] = True
    return {"images": jnp.asarray(r.rand(b,1024,1024,3).astype(np.float32)),
            "gt_polys": jnp.asarray(gt), "gt_labels": jnp.asarray(lb),
            "gt_valid": jnp.asarray(gv),
            "img_hw": jnp.full((b,2), 1024, jnp.int32)}


def bench_one(b):
    # fresh state per batch size, with COPIED params: the train step
    # donates its input state, which would delete the shared originals
    p = jax.tree.map(jnp.copy, params)
    bstats = jax.tree.map(jnp.copy, variables.get("batch_stats", {}))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=p,
                       batch_stats=bstats, opt_state=tx.init(p), tx=tx)
    step_fn = make_train_step(model, cfg)
    t0 = time.time()
    state, losses = step_fn(state, batch(0, b))
    print(f"B{b}: compile+first step {time.time()-t0:.1f} s; loss "
          f"{float(losses['loss_total']):.3f}", flush=True)
    bs = [batch(s, b) for s in range(1, 6)]
    for b_ in bs[:2]:
        state, losses = step_fn(state, b_)
    float(losses["loss_total"])  # drain
    t0 = time.time()
    for b_ in bs[2:]:
        state, losses = step_fn(state, b_)
    tot = float(losses["loss_total"])
    dt = (time.time()-t0)/3
    flops = mfu = None
    try:
        from orientedreppoints_tpu.parallel.train import step_cost_analysis

        # rebuild an un-donated state for the lowering
        p2 = jax.tree.map(jnp.copy, params)
        st2 = TrainState(step=jnp.zeros((), jnp.int32), params=p2,
                         batch_stats=jax.tree.map(
                             jnp.copy, variables.get("batch_stats", {})),
                         opt_state=tx.init(p2), tx=tx)
        flops = step_cost_analysis(step_fn, st2, bs[0])
        if flops:
            mfu = flops / dt / PEAK
    except Exception as e:  # cost analysis is best-effort
        print("cost analysis unavailable:", e, flush=True)
    pt = {"batch": b, "step_ms": round(dt * 1e3, 1),
          "img_per_s": round(b / dt, 2),
          "mfu": round(mfu, 4) if mfu else None,
          "gflops_per_step": round(flops / 1e9, 1) if flops else None,
          "loss_total": round(tot, 3)}
    print(json.dumps(pt), flush=True)
    return pt


sweep = []
for b in BATCHES:
    try:
        sweep.append(bench_one(b))
    except Exception as e:  # e.g. HBM OOM at large batch — record, continue
        print(f"B{b} failed: {type(e).__name__}: {str(e)[:200]}", flush=True)
        sweep.append({"batch": b, "error": str(e)[:200]})

ok = [p for p in sweep if "error" not in p]
best = max(ok, key=lambda p: p["img_per_s"]) if ok else None
out = {
    "metric": "train_throughput_r50_1024",
    "value": best["img_per_s"] if best else None,
    "unit": "img/s/chip",
    "step_ms": best["step_ms"] if best else None,
    "batch": best["batch"] if best else None,
    "mfu": best["mfu"] if best else None,
    "loss_total": best["loss_total"] if best else None,
    "sweep": sweep,
}
print(json.dumps(out))
with open(osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                   "TRAIN_BENCH.json"), "w") as f:
    json.dump(out, f, indent=2)
