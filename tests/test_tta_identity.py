"""TTA merge semantics at the API boundary.

The aug_test contract (reference orientedreppoints_detector.py:111-144 +
MultiScaleFlipAug, mmdet/datasets/pipelines/test_aug.py:8) degenerates to
the plain test path when the recipe is the single identity aug: decode
without NMS -> map back (scale 1.0, no flip) -> one merged rnms is the
same computation as decode_detections.  So run_inference_tta([(1.0,
False)]) must reproduce run_inference det-for-det — a full-pipeline
equivalence that catches canvas, scale-factor, flip-mapping, and NMS-cap
wiring bugs in one assertion.  Also drives a >1 scale through the
expanded static canvas (r > 1 content used to be cropped) and asserts the
mapped-back detections land in the original frame.
"""

import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

pytestmark = pytest.mark.slow

CANVAS = (160, 160)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from orientedreppoints_tpu.apis import init_detector
    from orientedreppoints_tpu.data.synth import generate_synth_dota
    from orientedreppoints_tpu.devkit.dota2coco import dota2coco_train
    from orientedreppoints_tpu.utils import Config, builder

    root = tmp_path_factory.mktemp("tta_identity")
    generate_synth_dota(str(root), 2, size=128, n_objects=4, seed=11)
    ann = str(root / "test.json")
    dota2coco_train(str(root), ann)

    cfg = Config(dict(
        model=dict(
            type="OrientedRepPointsDetector",
            backbone=dict(type="ResNet", depth=18, frozen_stages=-1),
            neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                      out_channels=32, start_level=1, add_extra_convs=True,
                      num_outs=5),
            bbox_head=dict(
                type="OrientedRepPointsHead", num_classes=7, in_channels=32,
                feat_channels=32, point_feat_channels=32, stacked_convs=1,
                num_points=9, gradient_mul=0.3,
                point_strides=[8, 16, 32, 64, 128], point_base_scale=2,
            ),
        ),
        # score_thr small enough that a random-init head (focal bias) still
        # emits detections — the identity probe must not be vacuous
        test_cfg=dict(nms_pre=100, min_bbox_size=0, score_thr=0.003,
                      nms=dict(type="rnms", iou_thr=0.4), max_per_img=30,
                      pre_nms_cap=128),
        data=dict(test=dict(
            type="DotaDataset", ann_file=ann,
            img_prefix=str(root / "images") + "/",
            pipeline=[
                dict(type="LoadImageFromFile"),
                dict(type="RotateResize", img_scale=(128, 128),
                     keep_ratio=True),
                dict(type="Normalize", mean=[123.675, 116.28, 103.53],
                     std=[58.395, 57.12, 57.375], to_rgb=True),
                dict(type="Pad", size_divisor=32),
            ])),
        tpu=dict(canvas_buckets=[CANVAS]),
    ))
    model, variables, cfg = init_detector(cfg)
    ds = builder.build_dataset({**cfg.data["test"], "test_mode": True})
    return model, variables, ds, cfg.test_cfg


def _run_plain(setup):
    from orientedreppoints_tpu.apis import run_inference

    model, variables, ds, tc = setup
    return run_inference(model, variables, ds, tc, canvas=CANVAS,
                         batch_size=2, num_fg=6)


def test_single_identity_aug_equals_plain_path(setup):
    from orientedreppoints_tpu.apis import run_inference_tta

    model, variables, ds, tc = setup
    plain = _run_plain(setup)
    tta = run_inference_tta(model, variables, ds, tc, [(1.0, False)],
                            canvas=CANVAS, batch_size=2, num_fg=6)
    assert set(plain) == set(tta)
    n = 0
    for name in plain:
        for ci, (a, b) in enumerate(zip(plain[name], tta[name])):
            assert a.shape == b.shape, (name, ci, a.shape, b.shape)
            if a.size:
                np.testing.assert_allclose(
                    a, b, rtol=2e-4, atol=2e-3, err_msg=f"{name} cls{ci}")
                n += len(a)
    assert n > 0, "identity equivalence is vacuous: zero detections"


def test_upscale_aug_maps_back_in_frame(setup):
    from orientedreppoints_tpu.apis import run_inference_tta

    model, variables, ds, tc = setup
    tta = run_inference_tta(model, variables, ds, tc, [(1.5, False)],
                            canvas=CANVAS, batch_size=2, num_fg=6)
    n = 0
    for name, per_cls in tta.items():
        for a in per_cls:
            if not a.size:
                continue
            assert np.isfinite(a).all(), name
            xs = a[:, 0:8:2].mean(axis=1)
            ys = a[:, 1:8:2].mean(axis=1)
            assert (xs > -8).all() and (xs < 136).all(), (name, xs)
            assert (ys > -8).all() and (ys < 136).all(), (name, ys)
            n += len(a)
    assert n > 0, "upscale probe vacuous: zero detections"
