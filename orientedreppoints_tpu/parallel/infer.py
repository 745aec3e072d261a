"""Data-parallel SPMD inference over a device mesh.

Reference analogue: `mmdet/apis/test.py::multi_gpu_test` (:32) — the
reference shards the dataset across DDP processes and gathers result
pickles host-side.  The TPU-native equivalent is simpler and faster:
ONE process drives all local chips, the padded image batch is sharded
batch-first over a 1-D 'data' mesh with `jax.shard_map`, and every chip
runs the identical forward+decode+NMS program on its local shard (the
Pallas NMS kernels stay per-device).  Outputs come back batch-sharded;
there are no collectives on this path at all — fetching to host is the
gather.

`shard_map` (not plain pjit sharding annotations) is load-bearing here:
the decode path contains Pallas kernels and `lax.map` loops over the
batch axis, which XLA's SPMD partitioner would serialize or gather;
under shard_map each shard traces the ordinary single-device program.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

__all__ = ["data_mesh", "round_up_batch", "shard_infer"]


def data_mesh(min_devices: int = 2) -> Mesh | None:
    """1-D 'data' mesh over all addressable devices; None below min."""
    devs = jax.devices()
    if len(devs) < min_devices:
        return None
    return Mesh(np.array(devs), ("data",))


def round_up_batch(batch_size: int, mesh: Mesh | None) -> int:
    """Smallest batch >= batch_size divisible by the mesh (shard_map
    requires the sharded axis to split evenly; callers already pad the
    last batch, so rounding the bucket up is free)."""
    if mesh is None:
        return batch_size
    n = mesh.size
    return ((batch_size + n - 1) // n) * n


def shard_infer(infer_fn, mesh: Mesh | None, batch_axes=(0,)):
    """Jit `infer_fn(variables, *batch_arrays)` data-parallel over `mesh`.

    batch_axes: for each array argument after `variables`, the axis that
    carries the image batch (e.g. 0 for (B, H, W, 3) canvases, 1 for the
    TTA path's (A, B, H, W, 3) aug stacks).  Every output leaf must be
    batch-first.  With mesh=None this is plain jax.jit — the graphs are
    unchanged on single-chip hosts.
    """
    if mesh is None:
        return jax.jit(infer_fn)

    def spec(ax):
        return PS(*([None] * ax + ["data"]))

    in_specs = (PS(),) + tuple(spec(a) for a in batch_axes)
    sm = jax.shard_map(
        infer_fn, mesh=mesh, in_specs=in_specs, out_specs=PS("data"),
        check_vma=False,  # params are replicated, outputs purely per-shard
    )
    return jax.jit(
        sm,
        in_shardings=(NamedSharding(mesh, PS()),)
        + tuple(NamedSharding(mesh, spec(a)) for a in batch_axes),
        out_shardings=NamedSharding(mesh, PS("data")),
    )
