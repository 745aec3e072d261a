"""Checkpoint save -> eval-restore round trips.

Covers the gap that let tools/test.py --checkpoint break in round 3:
trainers (tools/train.py, tools/synth_benchmark.py) save the FULL
TrainState (params + batch_stats + opt_state + step), while the eval
entry points (tools/test.py, apis.load_model) restore a params-only
template — orbax's StandardRestore refuses templates missing on-disk
keys, so the partial restore must go through
`utils.checkpoint.load_eval_variables` (PyTreeRestore partial_restore).

Reference analogue: mmcv load_checkpoint(strict=False) model-only loads
driven by the reference's tools/test.py:76.
"""

import jax.numpy as jnp
import numpy as np

from orientedreppoints_tpu.parallel import TrainState
from orientedreppoints_tpu.utils.checkpoint import (
    load_checkpoint, load_eval_variables, save_checkpoint)


def _state():
    return TrainState(
        step=jnp.asarray(7, jnp.int32),
        params={"stem": {"w": jnp.arange(8, dtype=jnp.float32)}},
        batch_stats={"stem": {"mean": jnp.full((3,), 2.5)}},
        opt_state=({"momentum": {"stem": {"w": jnp.ones(8)}}},),
        tx=None,
    )


def test_eval_restore_from_full_train_state(tmp_path):
    ck = str(tmp_path / "ckpts")
    save_checkpoint(ck, 7, _state())
    template = {
        "params": {"stem": {"w": jnp.zeros(8)}},
        "batch_stats": {"stem": {"mean": jnp.zeros(3)}},
    }
    variables, step = load_eval_variables(ck, template)
    assert step == 7
    np.testing.assert_allclose(
        variables["params"]["stem"]["w"], np.arange(8, dtype=np.float32))
    np.testing.assert_allclose(
        variables["batch_stats"]["stem"]["mean"], 2.5)
    assert "opt_state" not in variables


def test_eval_restore_norm_free_backbone(tmp_path):
    """Swin-style states have batch_stats={} — template must omit it."""
    st = _state().replace(batch_stats={})
    ck = str(tmp_path / "ckpts")
    save_checkpoint(ck, 3, st)
    variables, step = load_eval_variables(
        ck, {"params": {"stem": {"w": jnp.zeros(8)}}, "batch_stats": {}})
    assert step == 3
    np.testing.assert_allclose(
        variables["params"]["stem"]["w"], np.arange(8, dtype=np.float32))
    assert not variables.get("batch_stats")


def test_resume_restore_round_trip(tmp_path):
    """load_checkpoint (training resume) still restores the full state."""
    ck = str(tmp_path / "ckpts")
    save_checkpoint(ck, 7, _state())
    fresh = TrainState(
        step=jnp.zeros((), jnp.int32),
        params={"stem": {"w": jnp.zeros(8)}},
        batch_stats={"stem": {"mean": jnp.zeros(3)}},
        opt_state=({"momentum": {"stem": {"w": jnp.zeros(8)}}},),
        tx=None,
    )
    out = load_checkpoint(ck, fresh)
    state = out[0] if isinstance(out, tuple) else out
    assert int(state.step) == 7
    np.testing.assert_allclose(
        state.opt_state[0]["momentum"]["stem"]["w"], 1.0)
