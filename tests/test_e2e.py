"""End-to-end integration: synthetic mini-DOTA -> train steps (loss drops)
-> inference decode -> Task1 txt -> devkit evaluation runs."""

import json
import os.path as osp

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orientedreppoints_tpu.core.loss_head import LossConfig
from orientedreppoints_tpu.core.rbox import rbbox2result
from orientedreppoints_tpu.devkit.evaluation import eval_dota_task1
from orientedreppoints_tpu.devkit.result_merge import (
    merge_by_poly,
    write_task1_results,
)
from orientedreppoints_tpu.models import (
    OrientedRepPointsDetector,
    decode_detections,
)
from orientedreppoints_tpu.parallel import (
    TrainState,
    build_optimizer,
    lr_schedule,
    make_train_step,
)

IMG = 128


@pytest.fixture(scope="module")
def tiny_setup():
    model = OrientedRepPointsDetector(depth=18, num_classes=16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    )
    return model, variables


def one_batch(rng):
    imgs = rng.rand(2, IMG, IMG, 3).astype(np.float32)
    gt_polys = np.zeros((2, 4, 8), np.float32)
    gt_labels = np.zeros((2, 4), np.int32)
    gt_valid = np.zeros((2, 4), bool)
    for i in range(2):
        gt_polys[i, 0] = [30, 30, 80, 30, 80, 64, 30, 64]
        gt_labels[i, 0] = 3
        gt_valid[i, 0] = True
    return {
        "images": jnp.asarray(imgs),
        "gt_polys": jnp.asarray(gt_polys),
        "gt_labels": jnp.asarray(gt_labels),
        "gt_valid": jnp.asarray(gt_valid),
        "img_hw": jnp.full((2, 2), IMG, jnp.int32),
    }


class TestTrainLoop:
    def test_loss_decreases_overfit(self, tiny_setup, rng):
        model, variables = tiny_setup
        params = jax.tree.map(jnp.copy, variables["params"])
        sched = lambda step: 0.002  # constant LR for the overfit check
        tx = build_optimizer(params, sched)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
            opt_state=tx.init(params), tx=tx,
        )
        step_fn = make_train_step(model, LossConfig(max_pos=32))
        batch = one_batch(rng)
        first = None
        for i in range(12):
            state, losses = step_fn(state, batch)
            total = float(losses["loss_total"])
            assert np.isfinite(total), (i, losses)
            if first is None:
                first = total
        assert total < first, (first, total)


class TestInferenceToEval:
    def test_decode_format_eval(self, tiny_setup, tmp_path, rng):
        model, variables = tiny_setup
        imgs = jnp.asarray(rng.rand(1, IMG, IMG, 3).astype(np.float32))

        @jax.jit
        def infer(v, x):
            outs = model.apply(v, x)
            return decode_detections(
                outs, nms_pre=200, score_thr=1e-5, iou_thr=0.4,
                max_per_img=50,
                pre_nms_cap=256,  # default 4096 = multi-minute CPU compile
            )

        dets, labels, valid = infer(variables, imgs)
        dets, labels, valid = map(np.asarray, (dets, labels, valid))
        keep = valid[0]
        per_class = rbbox2result(dets[0][keep][:, -9:], labels[0][keep], 16)
        assert len(per_class) == 15
        # tile-name the image so ResultMerge can invert it
        results = {"P0001__1.0__0___0": per_class}
        from orientedreppoints_tpu.devkit.dota_utils import DOTA10_CLASSES

        raw = str(tmp_path / "raw")
        merged = str(tmp_path / "merged")
        write_task1_results(results, DOTA10_CLASSES, raw)
        merge_by_poly(raw, merged, num_process=1)

        # synthetic gt annotation for evaluation
        anndir = tmp_path / "ann"
        anndir.mkdir()
        with open(anndir / "P0001.txt", "w") as f:
            f.write("30 30 80 30 80 64 30 64 bridge 0\n")
        mAP, aps = eval_dota_task1(
            osp.join(merged, "Task1_{:s}.txt"),
            str(anndir / "{:s}.txt"),
            ["P0001"],
            use_07_metric=False,
        )
        # random weights -> tiny mAP, but the whole pipeline must run
        assert 0.0 <= mAP <= 1.0
