"""End-to-end CLI smoke: drive tools/test.py as a subprocess on a tiny
synthetic dataset over the 8-device virtual CPU mesh.

Covers the user-facing eval entry point at the process boundary —
config parse, dataset build, data-parallel sharded inference
(parallel/infer.py), --eval scoring and --format_task1 writing — the
layer unit tests can't see (round 3 shipped two latent breaks here:
the partial checkpoint restore and the batch_stats KeyError).
"""

import json
import os
import os.path as osp
import subprocess

import pytest
import sys

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

_CFG = """
norm_cfg = dict(type="GN", num_groups=32, requires_grad=True)
model = dict(
    type="OrientedRepPointsDetector",
    backbone=dict(type="ResNet", depth=18, frozen_stages=-1),
    neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
              out_channels=256, start_level=1, add_extra_convs=True,
              num_outs=5, norm_cfg=norm_cfg),
    bbox_head=dict(
        type="OrientedRepPointsHead", num_classes=16, in_channels=256,
        feat_channels=256, point_feat_channels=256, stacked_convs=3,
        num_points=9, gradient_mul=0.3,
        point_strides=[8, 16, 32, 64, 128], point_base_scale=2,
        norm_cfg=norm_cfg,
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_rbox_init=dict(type="GIoULoss", loss_weight=0.375),
        loss_rbox_refine=dict(type="GIoULoss", loss_weight=1.0),
        loss_spatial_init=dict(type="SpatialBorderLoss", loss_weight=0.05),
        loss_spatial_refine=dict(type="SpatialBorderLoss",
                                 loss_weight=0.1),
        top_ratio=0.4,
    ),
)
train_cfg = dict(
    init=dict(assigner=dict(type="PointAssigner", scale=4, pos_num=1),
              allowed_border=-1, pos_weight=-1),
    refine=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.1,
                              neg_iou_thr=0.1, min_pos_iou=0,
                              ignore_iof_thr=-1),
                allowed_border=-1, pos_weight=-1),
)
# tiny caps: CPU compile of the unrolled suppression scan is the cost
test_cfg = dict(nms_pre=50, min_bbox_size=0, score_thr=0.05,
                nms=dict(type="rnms", iou_thr=0.4), max_per_img=25,
                pre_nms_cap=128)
dataset_type = "DotaDataset"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="RotateResize", img_scale=(128, 128), keep_ratio=True),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
]
data = dict(
    imgs_per_gpu=2, workers_per_gpu=0,
    test=dict(type=dataset_type, ann_file="{ann}", img_prefix="{imgs}",
              pipeline=test_pipeline),
)
tpu = dict(compute_dtype="float32", canvas_buckets=[(128, 128)])
"""


@pytest.mark.slow
def test_tools_test_cli_end_to_end(tmp_path):
    from orientedreppoints_tpu.data.synth import generate_synth_dota
    from orientedreppoints_tpu.devkit.dota2coco import dota2coco_train

    generate_synth_dota(str(tmp_path / "raw"), 3, size=128, n_objects=4)
    ann = str(tmp_path / "test.json")
    dota2coco_train(str(tmp_path / "raw"), ann)

    cfg_path = tmp_path / "cfg.py"
    cfg_path.write_text(_CFG.replace("{ann}", ann).replace(
        "{imgs}", str(tmp_path / "raw" / "images") + "/"))

    task1_dir = str(tmp_path / "task1")
    env = dict(os.environ)
    env.update({
        # the axon site hook overrides JAX_PLATFORMS; ORP_PLATFORM is the
        # tools' jax.config-level escape hatch (see tools/test.py)
        "ORP_PLATFORM": "cpu",
        "ORP_JAX_CACHE": "/tmp/orp_jax_cache",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "ORP_SCAN_BLK": "32",
    })
    proc = subprocess.run(
        [sys.executable, osp.join(REPO, "tools", "test.py"),
         str(cfg_path), "--batch_size", "3", "--eval",
         "--out", str(tmp_path / "res.npz"),
         "--format_task1", task1_dir],
        capture_output=True, text=True, timeout=1500, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    combined = proc.stdout + proc.stderr
    # the 8-device mesh path must actually engage (batch 3 -> 8)
    assert "data-parallel inference over 8 devices" in combined
    assert "batch_size 3 -> 8" in combined
    assert "tile-level mAP" in combined

    out = np.load(str(tmp_path / "res.npz"))
    names = {k.split("|")[0] for k in out.files}
    assert names == {"S0000", "S0001", "S0002"}

    txts = [f for f in os.listdir(task1_dir) if f.endswith(".txt")]
    assert txts, "no Task1 txts written"


@pytest.mark.slow
def test_tools_test_cli_tta(tmp_path):
    """--ms_tta + --flip_tta goes through the sharded TTA merge path."""
    from orientedreppoints_tpu.data.synth import generate_synth_dota
    from orientedreppoints_tpu.devkit.dota2coco import dota2coco_train

    generate_synth_dota(str(tmp_path / "raw"), 2, size=128, n_objects=4)
    ann = str(tmp_path / "test.json")
    dota2coco_train(str(tmp_path / "raw"), ann)

    cfg_path = tmp_path / "cfg.py"
    cfg_path.write_text(_CFG.replace("{ann}", ann).replace(
        "{imgs}", str(tmp_path / "raw" / "images") + "/"))

    env = dict(os.environ)
    env.update({
        # the axon site hook overrides JAX_PLATFORMS; ORP_PLATFORM is the
        # tools' jax.config-level escape hatch (see tools/test.py)
        "ORP_PLATFORM": "cpu",
        "ORP_JAX_CACHE": "/tmp/orp_jax_cache",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "ORP_SCAN_BLK": "32",
    })
    proc = subprocess.run(
        [sys.executable, osp.join(REPO, "tools", "test.py"),
         str(cfg_path), "--batch_size", "2",
         "--ms_tta", "0.75,1.0,1.25", "--flip_tta",
         "--out", str(tmp_path / "res.npz")],
        capture_output=True, text=True, timeout=1500, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    out = np.load(str(tmp_path / "res.npz"))
    names = {k.split("|")[0] for k in out.files}
    assert names == {"S0000", "S0001"}


@pytest.mark.slow
def test_tools_robustness_cli(tmp_path):
    """tools/test_robustness.py end-to-end: clean baseline P + corrupted
    settings via the Corrupt pipeline stage, P/mPC/rPC JSON artifact
    (reference tools/test_robustness.py + robustness_eval.py surface)."""
    from orientedreppoints_tpu.data.synth import generate_synth_dota
    from orientedreppoints_tpu.devkit.dota2coco import dota2coco_train

    generate_synth_dota(str(tmp_path / "raw"), 2, size=128, n_objects=4)
    ann = str(tmp_path / "test.json")
    dota2coco_train(str(tmp_path / "raw"), ann)

    cfg_path = tmp_path / "cfg.py"
    cfg = _CFG.replace("{ann}", ann).replace(
        "{imgs}", str(tmp_path / "raw" / "images") + "/")
    # test_robustness evaluates cfg.data["val"]
    cfg += "\ndata['val'] = dict(data['test'])\n"
    cfg_path.write_text(cfg)

    env = dict(os.environ)
    env.update({
        "ORP_PLATFORM": "cpu",
        "ORP_JAX_CACHE": "/tmp/orp_jax_cache",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "ORP_SCAN_BLK": "32",
    })
    out_json = str(tmp_path / "robust.json")
    proc = subprocess.run(
        [sys.executable, osp.join(REPO, "tools", "test_robustness.py"),
         str(cfg_path), "--corruptions", "gaussian_noise", "pixelate",
         "--severities", "3", "--max_images", "2", "--out", out_json],
        capture_output=True, text=True, timeout=1800, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    with open(out_json) as f:
        res = json.load(f)
    assert res["metric"] == "robustness_mPC"
    assert set(res["per_setting"]) == {"gaussian_noise@3", "pixelate@3"}
    for key in ("P", "mPC", "rPC"):
        assert isinstance(res[key], float)
    combined = proc.stdout + proc.stderr
    assert "clean baseline P" in combined
