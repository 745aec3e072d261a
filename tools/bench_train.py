#!/usr/bin/env python
"""Time the R-50 1024^2 full-APAA train step on the TPU chip."""
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

B = 2
rng = np.random.RandomState(0)
model = OrientedRepPointsDetector(depth=50, num_classes=16, dtype=jnp.bfloat16)
variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                jnp.zeros((1, 1024, 1024, 3), jnp.float32))
params = variables["params"]
tx = build_optimizer(params, lr_schedule(iters_per_epoch=100))
state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=tx.init(params), tx=tx)
cfg = LossConfig(max_pos=1024)
step_fn = make_train_step(model, cfg)

def batch(seed):
    r = np.random.RandomState(seed)
    gt = np.zeros((B, 64, 8), np.float32); lb = np.zeros((B, 64), np.int32)
    gv = np.zeros((B, 64), bool)
    for i in range(B):
        for j in range(40):
            cx, cy = r.rand(2) * 900 + 60
            w, h = r.rand(2) * 80 + 12
            a = r.rand() * np.pi
            c, s = np.cos(a), np.sin(a)
            rot = np.array([[-w/2,-h/2],[w/2,-h/2],[w/2,h/2],[-w/2,h/2]])
            gt[i, j] = ((rot @ [[c,s],[-s,c]]) + [cx, cy]).reshape(-1)
            lb[i, j] = r.randint(1, 16); gv[i, j] = True
    return {"images": jnp.asarray(r.rand(B,1024,1024,3).astype(np.float32)),
            "gt_polys": jnp.asarray(gt), "gt_labels": jnp.asarray(lb),
            "gt_valid": jnp.asarray(gv),
            "img_hw": jnp.full((B,2), 1024, jnp.int32)}

t0 = time.time()
state, losses = step_fn(state, batch(0))
print("compile+first step:", round(time.time()-t0, 1), "s; loss",
      float(losses["loss_total"]))
# steady state on fresh batches, force completion via scalar fetch
bs = [batch(s) for s in range(1, 6)]
for b_ in bs[:2]:
    state, losses = step_fn(state, b_)
float(losses["loss_total"])
t0 = time.time()
for b_ in bs[2:]:
    state, losses = step_fn(state, b_)
tot = float(losses["loss_total"])
dt = (time.time()-t0)/3
print(f"steady-state: {dt*1e3:.0f} ms/step @ B={B} -> {B/dt:.1f} img/s/chip; loss {tot:.3f}")

# rough MFU from the compiled step's XLA cost analysis (bf16 peak on
# v5e ~197 TFLOP/s); cost_analysis flops are per step-fn invocation
mfu = None
flops = None
try:
    from orientedreppoints_tpu.parallel.train import step_cost_analysis

    flops = step_cost_analysis(step_fn, state, bs[0])
    if flops:
        mfu = flops / dt / 197e12  # v5e bf16 peak ~197 TFLOP/s
        print(f"~{flops/1e9:.0f} GFLOP/step, MFU ~{mfu*100:.1f}%")
except Exception as e:  # cost analysis is best-effort
    print("cost analysis unavailable:", e)

import json
out = {
    "metric": "train_throughput_r50_1024",
    "value": round(B / dt, 2),
    "unit": "img/s/chip",
    "step_ms": round(dt * 1e3, 1),
    "batch": B,
    "mfu": round(mfu, 4) if mfu else None,
    "loss_total": round(tot, 3),
}
print(json.dumps(out))
with open(osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                   "TRAIN_BENCH.json"), "w") as f:
    json.dump(out, f, indent=2)
