#!/usr/bin/env python
"""Same-process interleaved A/B of the opt-in train-step variants.

Compares, on the real chip with interleaved timing (the only trustworthy
comparison given the tunnel's run-to-run jitter — PROGRESS r2 notes):

  base    — default graph (combined (N,2C) pair scatter, conv stem)
  window  — ORP_PAIR_SCATTER=window: 2 scatters of (N,2,2C) x-pair windows
            (ops/deform_conv.py:430)
  s2d     — ORP_STEM=s2d: space-to-depth ResNet stem (models/resnet.py:176)

Each variant gets its own trace (the flags are trace-time env reads); the
s2d variant has a different param tree so it gets its own model/state.
Timing: round-robin over variants, R repeats of S steps each, completion
forced via a scalar fetch; report median of per-variant round times.

Usage: tools/bench_variants_ab.py [--variants base,window,s2d] [--rounds 6]
"""
import argparse
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

from orientedreppoints_tpu.core.loss_head import LossConfig
from orientedreppoints_tpu.models import OrientedRepPointsDetector
from orientedreppoints_tpu.parallel import (
    TrainState, build_optimizer, lr_schedule, make_train_step)

B = 2


def make_batch(seed):
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
            rot = np.array([[-w/2, -h/2], [w/2, -h/2], [w/2, h/2], [-w/2, h/2]])
            gt[i, j] = ((rot @ [[c, s], [-s, c]]) + [cx, cy]).reshape(-1)
            lb[i, j] = r.randint(1, 16)
            gv[i, j] = True
    return {"images": jnp.asarray(r.rand(B, 1024, 1024, 3).astype(np.float32)),
            "gt_polys": jnp.asarray(gt), "gt_labels": jnp.asarray(lb),
            "gt_valid": jnp.asarray(gv),
            "img_hw": jnp.full((B, 2), 1024, jnp.int32)}


VARIANT_ENV = {
    "base": {},
    "window": {"ORP_PAIR_SCATTER": "window"},
    "s2d": {"ORP_STEM": "s2d"},
    "s2d_window": {"ORP_STEM": "s2d", "ORP_PAIR_SCATTER": "window"},
}


def build_variant(name):
    """Trace + init under the variant's env; restore env afterwards."""
    env = VARIANT_ENV[name]
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        model = OrientedRepPointsDetector(
            depth=50, num_classes=16, dtype=jnp.bfloat16)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 1024, 1024, 3), jnp.float32))
        params = variables["params"]
        tx = build_optimizer(params, lr_schedule(iters_per_epoch=100))
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=variables.get("batch_stats", {}),
                           opt_state=tx.init(params), tx=tx)
        step_fn = make_train_step(model, LossConfig(max_pos=1024))
        # compile + warm
        t0 = time.time()
        state, losses = step_fn(state, make_batch(0))
        ltot = float(losses["loss_total"])
        print(f"[{name}] compile+first: {time.time()-t0:.1f} s, "
              f"loss {ltot:.4f}", flush=True)
        return {"name": name, "step": step_fn, "state": state}
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base,window,s2d")
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()
    names = args.variants.split(",")

    variants = [build_variant(n) for n in names]
    batches = [make_batch(s) for s in range(1, 1 + args.steps)]
    # one warm pass each (fresh batches, post-compile)
    for v in variants:
        for b in batches:
            v["state"], losses = v["step"](v["state"], b)
        float(losses["loss_total"])

    times = {v["name"]: [] for v in variants}
    for r in range(args.rounds):
        for v in variants:
            t0 = time.time()
            for b in batches:
                v["state"], losses = v["step"](v["state"], b)
            float(losses["loss_total"])  # forces completion over the tunnel
            dt = (time.time() - t0) / args.steps
            times[v["name"]].append(dt)
        print(f"round {r}: " + "  ".join(
            f"{n}={times[n][-1]*1e3:.1f}ms" for n in times), flush=True)

    print("\n== medians over", args.rounds, "rounds ==")
    base_med = None
    for n in names:
        med = float(np.median(times[n]))
        if base_med is None:
            base_med = med
        print(f"{n:12s} {med*1e3:7.1f} ms/step   "
              f"{B/med:5.2f} img/s   vs base {med/base_med*100:5.1f}%")


if __name__ == "__main__":
    main()
