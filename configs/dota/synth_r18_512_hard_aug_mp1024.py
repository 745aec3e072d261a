# HARD synthetic benchmark, full augmentation recipe (round 3).
#
# Same model / data / evaluator as synth_r18_512_hard.py, but the train
# pipeline enables the complete reference aug stack — 4-image mosaic +
# mixup (poly_transforms.py:548-1023), HSV jitter (transforms.py:1156),
# and arbitrary-angle PolyRandomRotate (poly_transforms.py:348-471) — the
# recipe the reference's Swin 78.11 config combines, here applied to the
# trendable hard benchmark with a longer schedule (VERDICT r2 item 4).

import importlib.util as _ilu
import os.path as _osp

_spec = _ilu.spec_from_file_location(
    "_base_cfg", _osp.join(_osp.dirname(__file__), "synth_r18_512_hard.py")
)
_base = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_base)

norm_cfg = _base.norm_cfg
model = _base.model
train_cfg = _base.train_cfg
test_cfg = _base.test_cfg
dataset_type = _base.dataset_type
data_root = _base.data_root
img_norm_cfg = _base.img_norm_cfg
test_pipeline = _base.test_pipeline
evaluation = _base.evaluation
optimizer = _base.optimizer
optimizer_config = _base.optimizer_config
checkpoint_config = _base.checkpoint_config
log_config = _base.log_config
log_level = _base.log_level
load_from = None
resume_from = None

work_dir = "work_dirs/synth_r18_512_hard_aug_mp1024/"

train_pipeline = [
    # decoded-image RAM cache: the mosaic x mixup recipe loads 8 tiles per
    # output sample; caching removes the dominant PNG-decode host cost
    dict(type="LoadImageFromFile", cache=True),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="CorrectBox", correct_rbbox=True, refine_rbbox=True),
    dict(
        type="PolyMosaic",
        degrees=0, translate=0.1, scale=0.25, shear=0,
        perspective=0.0, ifcrop=True, mosaic_ratio=0.5,
    ),
    dict(type="MixUp", mixup_ratio=0.3),
    dict(type="HSVAugment", hgain=0.015, sgain=0.7, vgain=0.4),
    dict(type="PolyRandomRotate", rotate_ratio=0.5, angles_range=180),
    dict(type="RotateResize", img_scale=(512, 512), keep_ratio=True),
    dict(type="RotateRandomFlip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
]

data = dict(
    imgs_per_gpu=8,
    workers_per_gpu=2,
    train=dict(
        type=dataset_type,
        ann_file=data_root + "train_split/train.json",
        img_prefix=data_root + "train_split/images/",
        pipeline=train_pipeline,
    ),
    val=_base.data["val"],
    test=_base.data["test"],
)

lr_config = dict(
    policy="step",
    warmup="linear",
    warmup_iters=300,
    warmup_ratio=1.0 / 3,
    step=[100, 115],
)
total_epochs = 125

tpu = dict(
    global_batch_size=8,
    mesh_axes=("data",),
    compute_dtype="bfloat16",
    canvas_buckets=[(512, 512)],
    max_gt=128,
    max_pos=1024,
)
