#!/usr/bin/env python
"""Strip a training checkpoint to inference weights + content hash.

Reference analogue: tools/publish_model.py (drops optimizer state, appends
a hash to the filename).  Orbax checkpoints are directories; the published
artifact is a single .npz with params + batch_stats.
"""

from __future__ import annotations

import argparse
import hashlib
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", help="orbax checkpoint dir")
    p.add_argument("out", help="output .npz prefix")
    p.add_argument("--step", type=int)
    args = p.parse_args()

    import jax
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(osp.abspath(args.checkpoint)) as mngr:
        step = args.step if args.step is not None else mngr.latest_step()
        restored = mngr.restore(step)
    flat = {}
    for section in ("params", "batch_stats"):
        if section not in restored:
            continue
        leaves = jax.tree_util.tree_flatten_with_path(restored[section])[0]
        for path, v in leaves:
            key = section + "/" + "/".join(
                k.key if hasattr(k, "key") else str(k) for k in path
            )
            flat[key] = np.asarray(v)
    tmp = args.out + ".npz"
    np.savez(tmp, **flat)
    with open(tmp, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:8]
    final = f"{args.out}-{digest}.npz"
    osp.exists(final) or __import__("os").rename(tmp, final)
    print("published", final, f"({len(flat)} arrays, step {step})")


if __name__ == "__main__":
    main()
