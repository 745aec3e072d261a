"""Profiling / tracing utilities.

Reference analogue: mmdet/utils/profiling.py (`profile_time` wrapping
torch.autograd.profiler / nvtx).  Here the equivalents are:
  * profile_time — wall-clock context manager that forces device completion
    (jax.block_until_ready) so timings are honest through async dispatch;
  * trace — context manager around jax.profiler for XLA/TPU traces viewable
    in TensorBoard or Perfetto;
  * annotate — TraceAnnotation for named regions inside a trace.
"""

from __future__ import annotations

import contextlib
import logging
import time

import jax


@contextlib.contextmanager
def profile_time(name: str, stream=None, logger: logging.Logger | None = None):
    """Time a block, blocking on `stream` (any pytree of arrays) at exit."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if stream is not None:
            jax.block_until_ready(stream)
        dt = (time.perf_counter() - t0) * 1e3
        msg = f"[profile] {name}: {dt:.2f} ms"
        (logger or logging.getLogger("profile")).info(msg)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA/TPU profiler trace into log_dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region annotation inside an active trace."""
    return jax.profiler.TraceAnnotation(name)
