#!/usr/bin/env python
"""Micro-benchmark: DCN bilinear gather formulations on TPU.

Production shape = the stride-8 FPN level of a 1024^2 batch-4 forward:
feat (4, 128, 128, 256) bf16, K=9 samples/pixel -> 590k samples, and the
full deform_conv2d around it.  Compares:

  * 4take  — one jnp.take per bilinear corner (4N gather rows)
  * fused  — corners packed along channels, ONE take of N rows

Timing follows bench.py hygiene: iterations chained on device via
lax.map over pre-staged DISJOINT inputs, one scalar fetch at the end.
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--c", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/orp_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from orientedreppoints_tpu.ops.deform_conv import (
        _bilinear_gather_4take, _bilinear_gather_fused, deform_conv2d,
    )

    b, hw, c = args.b, args.hw, args.c
    k = 9
    rng = np.random.RandomState(0)

    feat = jnp.asarray(rng.randn(b, hw, hw, c), jnp.bfloat16)
    weight = jnp.asarray(rng.randn(k, c, c) * 0.05, jnp.bfloat16)

    def coords(seed):
        r = np.random.RandomState(seed)
        base = np.arange(hw, dtype=np.float32)
        py = base[None, :, None, None] + r.randn(b, hw, hw, k) * 4
        px = base[None, None, :, None] + r.randn(b, hw, hw, k) * 4
        return (jnp.asarray(py.reshape(b, -1), jnp.float32),
                jnp.asarray(px.reshape(b, -1), jnp.float32))

    def offs(seed):
        r = np.random.RandomState(seed)
        return jnp.asarray(r.randn(args.iters, b, hw, hw, 2 * k) * 4,
                           jnp.float32)

    def time_fn(fn, *inputs):
        """inputs: arrays with a leading iters axis, pre-staged on device."""
        @jax.jit
        def run(feat, *ins):
            return jnp.sum(jax.lax.map(
                lambda xs: jnp.sum(fn(feat, *xs).astype(jnp.float32)),
                ins,
            ))

        warm = tuple(jax.device_put(x) for x in inputs)
        fresh = tuple(jax.device_put(x + 0.001) for x in inputs)
        float(run(feat, *warm))
        t0 = time.time()
        float(run(feat, *fresh))
        return (time.time() - t0) / args.iters * 1e3  # ms/iter

    pys, pxs = zip(*(coords(s) for s in range(args.iters)))
    pys = jnp.stack(pys)
    pxs = jnp.stack(pxs)

    ms_4take = time_fn(_bilinear_gather_4take, pys, pxs)
    ms_fused = time_fn(_bilinear_gather_fused, pys, pxs)
    n_rows = b * hw * hw * k
    print(f"gather only   ({n_rows/1e3:.0f}k samples, C={c}):")
    print(f"  4take: {ms_4take:8.2f} ms  ({ms_4take*1e6/(4*n_rows):.2f} ns/row"
          f" over {4*n_rows/1e6:.1f}M rows)")
    print(f"  fused: {ms_fused:8.2f} ms  ({ms_fused*1e6/n_rows:.2f} ns/row"
          f" over {n_rows/1e6:.1f}M rows)  {ms_4take/ms_fused:.2f}x")

    # --- instance pairing: the head's cls and refine DCNs share sampling
    # indices but read DIFFERENT towers' tables.  Compare 8 narrow takes
    # (two instances, overlapped) vs 4 double-width takes over the
    # channel-concatenated tables (half the total gather rows, 2x row
    # bytes).  Gathers are row-count bound, but row-width throughput
    # degrades (512B ~30 -> 2KB ~70 GB/s eff) — measure which wins at 1KB.
    feat_b2 = jnp.asarray(rng.randn(b, hw, hw, c), jnp.bfloat16)
    feat_cat = jnp.concatenate([feat, feat_b2], axis=-1)

    def two_takes(_f, py, px):
        va = _bilinear_gather_4take(feat, py, px)
        vb = _bilinear_gather_4take(feat_b2, py, px)
        return va + vb  # cheap combine; gathers dominate

    def paired_take(_f, py, px):
        v = _bilinear_gather_4take(feat_cat, py, px)
        return v[..., :c] + v[..., c:]

    ms_two = time_fn(two_takes, pys, pxs)
    ms_pair = time_fn(paired_take, pys, pxs)
    print(f"two instances ({n_rows/1e3:.0f}k samples, C={c}):")
    print(f"  8 narrow takes: {ms_two:8.2f} ms   4 paired (2C) takes: "
          f"{ms_pair:8.2f} ms   {ms_two/ms_pair:.2f}x")

    o = offs(1)
    import os
    os.environ["ORP_DCN_GATHER"] = "4take"
    ms_dcn_4 = time_fn(lambda f, off: deform_conv2d(f, off, weight), o)
    os.environ["ORP_DCN_GATHER"] = "fused"
    ms_dcn_f = time_fn(lambda f, off: deform_conv2d(f, off, weight), o)
    os.environ.pop("ORP_DCN_GATHER")
    print(f"deform_conv2d (B{b} {hw}x{hw}x{c}, 3x3):")
    print(f"  4take: {ms_dcn_4:8.2f} ms   fused: {ms_dcn_f:8.2f} ms"
          f"   {ms_dcn_4/ms_dcn_f:.2f}x")


if __name__ == "__main__":
    main()
