#!/usr/bin/env python
"""Stage-by-stage train-step timing on the chip (R-50 @1024², full APAA
loss; batch size from ORP_BD_BATCH, default 2).

Nested prefixes: forward → +loss (no grad) → +backward (value_and_grad)
→ +optimizer update (= full step).  Same hygiene as bench_breakdown.py
(chained lax.map over pre-staged disjoint batches, one scalar fetch).
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

from orientedreppoints_tpu.core.loss_head import LossConfig, compute_losses
from orientedreppoints_tpu.models import OrientedRepPointsDetector
from orientedreppoints_tpu.parallel import (
    TrainState, build_optimizer, lr_schedule, make_train_step,
)

B = int(os.environ.get("ORP_BD_BATCH", "2"))
# Large B needs fewer device-staged batches: the bwd stage's grad graph
# plus 2*ITERS staged batches must fit HBM together (B8 OOMs at 5).
ITERS = int(os.environ.get("ORP_BD_ITERS", "5"))
rng = np.random.RandomState(0)
model = OrientedRepPointsDetector(depth=50, num_classes=16,
                                  dtype=jnp.bfloat16)
variables = jax.jit(model.init)(
    jax.random.PRNGKey(0), jnp.zeros((1, 1024, 1024, 3), jnp.float32))
params = variables["params"]
stats = variables.get("batch_stats", {})
cfg = LossConfig(max_pos=1024)


def batch(seed):
    r = np.random.RandomState(seed)
    gt = np.zeros((B, 64, 8), np.float32)
    lb = np.zeros((B, 64), np.int32)
    gv = np.zeros((B, 64), bool)
    for i in range(B):
        for j in range(40):
            cx, cy = r.rand(2) * 900 + 60
            w, h = r.rand(2) * 80 + 12
            a = r.rand() * np.pi
            c, s = np.cos(a), np.sin(a)
            rot = np.array(
                [[-w/2, -h/2], [w/2, -h/2], [w/2, h/2], [-w/2, h/2]])
            gt[i, j] = ((rot @ [[c, s], [-s, c]]) + [cx, cy]).reshape(-1)
            lb[i, j] = r.randint(1, 16)
            gv[i, j] = True
    return {"images": jnp.asarray(r.rand(B, 1024, 1024, 3).astype(np.float32)),
            "gt_polys": jnp.asarray(gt), "gt_labels": jnp.asarray(lb),
            "gt_valid": jnp.asarray(gv),
            "img_hw": jnp.full((B, 2), 1024, jnp.int32)}


def loss_of(p, b):
    outs = model.apply({"params": p, "batch_stats": stats}, b["images"])
    losses = compute_losses(outs, b["gt_polys"], b["gt_labels"],
                            b["gt_valid"], b["img_hw"], cfg)
    return sum(v for k, v in losses.items() if k.startswith("loss"))


def reduce_tree(t):
    return sum(jnp.sum(x.astype(jnp.float32))
               for x in jax.tree_util.tree_leaves(t))


stages = {
    "forward": lambda b: reduce_tree(
        model.apply({"params": params, "batch_stats": stats}, b["images"])),
    "forward+loss": lambda b: loss_of(params, b),
    "forward+loss+bwd": lambda b: (
        lambda lv, g: lv + reduce_tree(g))(
            *jax.value_and_grad(loss_of)(params, b)),
}

warm = jax.tree_util.tree_map(
    lambda *xs: jnp.stack(xs), *[batch(i) for i in range(ITERS)])
timed = jax.tree_util.tree_map(
    lambda *xs: jnp.stack(xs), *[batch(100 + i) for i in range(ITERS)])

prev = 0.0
for name, fn in stages.items():
    runner = jax.jit(lambda bs, fn=fn: jnp.sum(
        jax.lax.map(lambda b: fn(b), bs)))
    float(runner(warm))
    t0 = time.time()
    float(runner(timed))
    dt = (time.time() - t0) / ITERS * 1000
    print(f"{name:20s} {dt:8.1f} ms/step  (+{dt - prev:6.1f})", flush=True)
    prev = dt

# full step (optimizer included) via the production step_fn
tx = build_optimizer(params, lr_schedule(iters_per_epoch=100))
state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=stats, opt_state=tx.init(params), tx=tx)
step_fn = make_train_step(model, cfg)
bs = [batch(200 + s) for s in range(ITERS + 2)]
for b_ in bs[:2]:
    state, losses = step_fn(state, b_)
float(losses["loss_total"])
t0 = time.time()
for b_ in bs[2:]:
    state, losses = step_fn(state, b_)
float(losses["loss_total"])
dt = (time.time() - t0) / ITERS * 1000
print(f"{'full step (prod)':20s} {dt:8.1f} ms/step", flush=True)
