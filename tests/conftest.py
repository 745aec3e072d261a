"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is exercised by bench.py / the driver; unit tests validate
numerics and multi-chip sharding on host CPU with forced virtual devices.

NOTE: the environment exports JAX_PLATFORMS=axon (remote-TPU tunnel), so we
must override via jax.config, not just env vars.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# shrink the unrolled NMS suppression-scan block: identical results, ~4x
# smaller XLA:CPU graphs (the 128-row block made decode compiles take
# minutes; see ops/nms.py _SCAN_BLK)
os.environ.setdefault("ORP_SCAN_BLK", "32")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the geometry/assignment graphs are large and
# recompile across test processes otherwise
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("ORP_TEST_CACHE", "/tmp/orp_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
if os.environ.get("ORP_TEST_NOOPT"):
    # the unit tests validate NUMERICS/semantics, not codegen quality; on a
    # cold cache the XLA:CPU optimization passes dominate suite wall time
    # (the train-step graphs take minutes each) — same lever as
    # __graft_entry__.dryrun_multichip
    jax.config.update("jax_disable_most_optimizations", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute tests (flagship DP invariance, subprocess CLI "
        "chunking) — excluded by default; run with ORP_SLOW_TESTS=1 or "
        "-m slow",
    )


def pytest_collection_modifyitems(config, items):
    """Default/slow tier split (VERDICT r4 weak #6): the default tier must
    stay fast; the slow tier (ORP_SLOW_TESTS=1, or an explicit -m
    selection) keeps the flagship DP-invariance pair and the subprocess
    CLI tests runnable in CI."""
    if os.environ.get("ORP_SLOW_TESTS") or config.getoption("-m"):
        return
    skip = pytest.mark.skip(
        reason="slow tier: set ORP_SLOW_TESTS=1 (or -m slow) to run"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
