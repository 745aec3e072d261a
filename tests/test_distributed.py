"""Multi-host wiring smoke test: the ORP_COORDINATOR_ADDRESS /
ORP_NUM_PROCESSES / ORP_PROCESS_ID contract used by tools/dist_train.sh ->
tools/train.py (jax.distributed.initialize) actually brings up a
coordinator and serves collectives.

Runs in a subprocess: jax.distributed.initialize is process-global and
must not leak into the test runner's JAX runtime.
"""

import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    """Ask the kernel for a free port (bind 0, read it back, release)."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]

_CHILD = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")

# same call path as tools/train.py:54-59 driven by dist_train.sh env
jax.distributed.initialize(
    coordinator_address=os.environ["ORP_COORDINATOR_ADDRESS"],
    num_processes=int(os.environ["ORP_NUM_PROCESSES"]),
    process_id=int(os.environ["ORP_PROCESS_ID"]),
)
assert jax.process_count() == 1
assert jax.process_index() == 0

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

mesh = Mesh(np.array(jax.devices()), ("data",))
f = jax.jit(shard_map(
    lambda x: jax.lax.psum(x, "data"),
    mesh=mesh, in_specs=P("data"), out_specs=P(),
))
out = f(jnp.arange(4, dtype=jnp.float32))
assert float(out[0]) == 6.0, out
print("DIST_OK", jax.process_count())
"""


_CHILD2 = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["ORP_COORDINATOR_ADDRESS"],
    num_processes=int(os.environ["ORP_NUM_PROCESSES"]),
    process_id=int(os.environ["ORP_PROCESS_ID"]),
)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from jax.experimental.shard_map import shard_map

assert jax.process_count() == 2
assert len(jax.devices()) == 8   # global devices across both processes
mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
f = jax.jit(shard_map(lambda x: jax.lax.psum(x, "data"),
                      mesh=mesh, in_specs=P("data"), out_specs=P()))
x = jax.make_array_from_callback(
    (8,), NamedSharding(mesh, P("data")),
    lambda idx: np.arange(8, dtype=np.float32)[idx])
out = f(x)
val = float(np.asarray(out.addressable_data(0))[0])
assert val == 28.0, val
print("DIST2_OK", jax.process_index())
"""


def test_two_process_pod_psum():
    """Two host processes x 4 virtual devices join one coordinator (the
    dist_train.sh multi-host contract) and a cross-process psum over the
    8-device global mesh returns the right value on both."""
    procs = []
    addr = f"localhost:{_free_port()}"
    for pid in (0, 1):
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _CHILD2],
            env={
                "PATH": "/usr/bin:/bin",
                "HOME": "/root",
                "ORP_COORDINATOR_ADDRESS": addr,
                "ORP_NUM_PROCESSES": "2",
                "ORP_PROCESS_ID": str(pid),
            },
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    for p in procs:
        out, err = p.communicate(timeout=280)
        assert p.returncode == 0, err[-2000:]
        assert "DIST2_OK" in out


def test_single_process_coordinator_init():
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD],
        env={
            "PATH": "/usr/bin:/bin",
            "HOME": "/root",
            "ORP_COORDINATOR_ADDRESS": f"localhost:{_free_port()}",
            "ORP_NUM_PROCESSES": "1",
            "ORP_PROCESS_ID": "0",
        },
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "DIST_OK 1" in proc.stdout


@pytest.mark.slow
def test_flagship_dp_loss_invariance():
    """Flagship-configuration DP invariance (moved here from the driver's
    dryrun_multichip, which is now sized for the driver's time budget):
    the FULL R-50@512 train step — max_gt 64 / max_pos 1024 full-APAA
    loss, SGD + clip-35 + frozen stage 1 — jitted over the 8-device
    'data' mesh must produce the same loss as a single-device evaluation
    of the identical global batch (psum'd shard-mean == local mean, the
    reference's DDP allreduce semantics, mmdet/apis/train.py:115-145 and
    mmdet/core/utils/dist_utils.py:9-56).

    The comparison graph is loss-only: the assert is on the loss value,
    so compiling a second flagship backward buys nothing.  This is the
    most expensive compile in the suite (~8 min cold cache on a 1-CPU
    host; seconds warm) — everything it covers at small scale also runs
    in test_train.py::test_dp_loss_invariance.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from orientedreppoints_tpu.core.loss_head import (
        LossConfig, compute_losses,
    )
    from orientedreppoints_tpu.models import OrientedRepPointsDetector
    from orientedreppoints_tpu.parallel import (
        TrainState, build_optimizer, lr_schedule, make_train_step,
    )
    from orientedreppoints_tpu.parallel.train import default_frozen_prefixes

    img, max_gt, b = 512, 64, 8
    mesh = Mesh(np.array(jax.devices()), ("data",))
    model = OrientedRepPointsDetector(depth=50, num_classes=16)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3), jnp.float32)
    )
    tx = build_optimizer(
        variables["params"], lr_schedule(iters_per_epoch=100),
        frozen_prefixes=default_frozen_prefixes(1),
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )
    cfg = LossConfig(max_pos=1024)
    # the train step donates its input state; keep variable copies for the
    # single-device comparison below
    vars_single = jax.tree.map(jnp.copy, variables)

    rng = np.random.RandomState(0)
    gt = np.zeros((b, max_gt, 8), np.float32)
    lb = np.zeros((b, max_gt), np.int32)
    gv = np.zeros((b, max_gt), bool)
    for i in range(b):
        for j in range(24):
            cx, cy = rng.rand(2) * (img - 120) + 60
            w, h = rng.rand(2) * 60 + 12
            a = rng.rand() * np.pi
            c, s = np.cos(a), np.sin(a)
            rot = np.array([[-w / 2, -h / 2], [w / 2, -h / 2],
                            [w / 2, h / 2], [-w / 2, h / 2]])
            gt[i, j] = ((rot @ [[c, s], [-s, c]]) + [cx, cy]).reshape(-1)
            lb[i, j] = rng.randint(1, 16)
            gv[i, j] = True
    batch = {
        "images": jnp.asarray(rng.rand(b, img, img, 3).astype(np.float32)),
        "gt_polys": jnp.asarray(gt),
        "gt_labels": jnp.asarray(lb),
        "gt_valid": jnp.asarray(gv),
        "img_hw": jnp.full((b, 2), img, jnp.int32),
    }
    step_fn = make_train_step(model, cfg, mesh=mesh)
    state2, losses = step_fn(state, batch)
    total = float(losses["loss_total"])
    assert np.isfinite(total), losses
    assert int(state2.step) == 1

    def loss_only(v, bt):
        # replicate the step's rng derivation (no-op for dropout-free R-50)
        rng_d = jax.random.fold_in(
            jax.random.key(0), jnp.zeros((), jnp.int32))
        outs = model.apply(
            v, bt["images"], deterministic=False, rngs={"dropout": rng_d})
        ls = compute_losses(
            outs, bt["gt_polys"], bt["gt_labels"], bt["gt_valid"],
            bt["img_hw"], cfg)
        return sum(v for k, v in ls.items() if k.startswith("loss"))

    total_1 = float(jax.jit(loss_only)(vars_single, batch))
    tol = 2e-5 * max(1.0, abs(total_1))
    assert abs(total - total_1) <= tol, (total, total_1, tol)


def test_sharded_inference_matches_single_device():
    """parallel.shard_infer (the multi_gpu_test equivalent in
    tools/test.py / serving.Predictor): batch-sharded decode over the
    8-device virtual mesh must return exactly the single-device
    outputs — the path has no collectives, so any divergence is a
    sharding-spec bug."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from orientedreppoints_tpu.models import (
        OrientedRepPointsDetector, decode_detections,
    )
    from orientedreppoints_tpu.parallel import (
        data_mesh, round_up_batch, shard_infer,
    )

    mesh = data_mesh()
    assert mesh is not None and mesh.size == 8

    model = OrientedRepPointsDetector(depth=18, num_classes=16)
    imgs0 = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs0)

    def infer_core(v, x, sf):
        # small caps: the default pre_nms_cap makes the unrolled
        # suppression scan a multi-minute CPU compile
        return decode_detections(
            model.apply(v, x), max_per_img=50, nms_pre=100,
            pre_nms_cap=256, scale_factor=sf,
        )

    bs = round_up_batch(3, mesh)
    assert bs == 8
    r = np.random.RandomState(0)
    imgs = jnp.asarray(r.rand(bs, 128, 128, 3).astype(np.float32))
    sf = jnp.asarray(
        (0.5 + r.rand(bs)).astype(np.float32))[:, None, None]

    single = jax.jit(infer_core)(variables, imgs, sf)
    sharded = shard_infer(infer_core, mesh, batch_axes=(0, 0))(
        variables, imgs, sf)
    for name, a, b in zip(("dets", "labels", "valid"), single, sharded):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name)
