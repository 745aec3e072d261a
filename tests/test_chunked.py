"""Auto-chunked long-run training (utils/chunked.py).

The axon runtime leaks host RSS per H2D transfer; round 3's 85-epoch OOM
was mitigated by hand-relaunching with --stop_epoch/--resume.  chunked.py
makes the relaunch automatic via os.execv at epoch boundaries, restoring
the reference runner's unattended epoch-loop behavior
(/root/reference/mmdet/apis/train.py:179-183).  The subprocess test drives
tools/train.py with a threshold below baseline RSS so EVERY epoch boundary
re-execs — the run must still complete all epochs through the resume path.
"""

import os
import os.path as osp
import subprocess

import pytest
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

_TRAIN_CFG = """
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
test_cfg = dict(nms_pre=50, min_bbox_size=0, score_thr=0.05,
                nms=dict(type="rnms", iou_thr=0.4), max_per_img=25,
                pre_nms_cap=128)
dataset_type = "DotaDataset"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="CorrectBox", correct_rbbox=True, refine_rbbox=True),
    dict(type="RotateResize", img_scale=(128, 128), keep_ratio=True),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
]
data = dict(
    imgs_per_gpu=2, workers_per_gpu=0,
    train=dict(type=dataset_type, ann_file="{ann}", img_prefix="{imgs}",
               pipeline=train_pipeline),
)
optimizer = dict(type="SGD", lr=0.001, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy="step", warmup="linear", warmup_iters=5,
                 warmup_ratio=0.1, step=[2])
total_epochs = 2
tpu = dict(compute_dtype="float32", canvas_buckets=[(128, 128)],
           max_pos=64)
"""


class TestArgvWithFlags:
    def test_ensure_bare_flags(self):
        from orientedreppoints_tpu.utils.chunked import argv_with_flags

        argv = ["tools/x.py", "--seed", "1"]
        out = argv_with_flags(argv, ensure=["--resume", "--skip_gen"])
        assert out == ["tools/x.py", "--seed", "1", "--resume",
                       "--skip_gen"]
        # idempotent
        assert argv_with_flags(out, ensure=["--resume"]) == out
        assert argv == ["tools/x.py", "--seed", "1"]  # input untouched

    def test_ensure_kv_replaces_and_appends(self):
        from orientedreppoints_tpu.utils.chunked import argv_with_flags

        argv = ["t.py", "cfg.py", "--resume_from", "old", "--seed", "1"]
        out = argv_with_flags(argv, ensure_kv={"--resume_from": "new"})
        assert out == ["t.py", "cfg.py", "--resume_from", "new",
                       "--seed", "1"]
        out2 = argv_with_flags(["t.py", "cfg.py"],
                               ensure_kv={"--resume_from": "d"})
        assert out2 == ["t.py", "cfg.py", "--resume_from", "d"]

    def test_current_rss_sane(self):
        from orientedreppoints_tpu.utils.chunked import current_rss_gb

        rss = current_rss_gb()
        assert 0.005 < rss < 200.0, rss

    def test_maybe_reexec_below_threshold_noop(self):
        from orientedreppoints_tpu.utils.chunked import maybe_reexec

        called = []
        maybe_reexec(1e9, lambda: called.append(1), lambda a: a)
        maybe_reexec(0, lambda: called.append(1), lambda a: a)
        maybe_reexec(-1, lambda: called.append(1), lambda a: a)
        assert not called


@pytest.mark.slow
def test_train_cli_auto_chunks_to_completion(tmp_path):
    """tools/train.py with --rss_limit_gb far below baseline RSS must
    re-exec (os.execv) at every epoch boundary and still finish both
    epochs in one command, resuming from the per-epoch checkpoint."""
    from orientedreppoints_tpu.data.synth import generate_synth_dota
    from orientedreppoints_tpu.devkit.dota2coco import dota2coco_train

    generate_synth_dota(str(tmp_path / "raw"), 3, size=128, n_objects=4)
    ann = str(tmp_path / "train.json")
    dota2coco_train(str(tmp_path / "raw"), ann)

    cfg_path = tmp_path / "cfg.py"
    cfg_path.write_text(_TRAIN_CFG.replace("{ann}", ann).replace(
        "{imgs}", str(tmp_path / "raw" / "images") + "/"))
    work_dir = str(tmp_path / "wd")

    env = dict(os.environ)
    env.update({
        "ORP_PLATFORM": "cpu",
        "ORP_JAX_CACHE": "/tmp/orp_jax_cache",
        "ORP_SCAN_BLK": "32",
        # single CPU device: the tiny dataset's batches aren't divisible
        # by the 8-dev virtual mesh the surrounding suite configures
        "XLA_FLAGS": "",
    })
    proc = subprocess.run(
        [sys.executable, osp.join(REPO, "tools", "train.py"),
         str(cfg_path), "--work_dir", work_dir,
         "--rss_limit_gb", "0.01", "--log_interval", "1"],
        capture_output=True, text=True, timeout=1500, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    log = open(osp.join(work_dir, "train.log")).read()
    # one re-exec at the single non-final epoch boundary (0 -> 1); the
    # log file is appended to across execs, so both processes' lines
    # survive
    assert log.count("[chunked] host RSS") == 1, log[-3000:]
    assert log.count("resumed from") == 1, log[-3000:]
    for ep in (0, 1):
        assert f"epoch {ep} done" in log
    assert "training finished" in log
    ckpts = os.listdir(osp.join(work_dir, "ckpts"))
    assert ckpts, "no checkpoints written"
