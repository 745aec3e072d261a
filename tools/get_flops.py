#!/usr/bin/env python
"""FLOPs/params counter via XLA cost analysis.

Reference analogue: tools/get_flops.py + mmdet/utils/flops_counter.py —
here the compiled HLO's own cost analysis is authoritative (counts exactly
what will run on the TPU, fused ops included).
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp

from orientedreppoints_tpu.utils import Config, builder


def main():
    p = argparse.ArgumentParser(description="Model FLOPs and params")
    p.add_argument("config")
    p.add_argument("--shape", type=int, nargs=2, default=[1024, 1024])
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    model = builder.build_detector(cfg, "float32")
    h, w = args.shape
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    n_params = sum(
        int(v.size) for v in jax.tree.leaves(variables["params"])
    )

    def fwd(v, x):
        return model.apply(v, x)

    lowered = jax.jit(fwd).lower(variables, x)
    cost = lowered.compile().cost_analysis()
    flops = cost.get("flops", float("nan"))
    print(f"Input shape: (1, {h}, {w}, 3)")
    print(f"Params: {n_params / 1e6:.2f} M")
    print(f"Forward FLOPs (XLA cost analysis): {flops / 1e9:.2f} GFLOPs")


if __name__ == "__main__":
    main()
