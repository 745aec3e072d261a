# OrientedRepPoints R-50 with mosaic + mixup augmentation.
# Same as orientedreppoints_r50_demo.py but the train pipeline enables the
# multi-sample poly transforms (reference poly_transforms.py:548-1023:
# Poly_Mosaic_RandomPerspective + MixUp; registered in the reference's
# pipeline registry but shipped without a config — this config is the
# canonical way to switch them on here).

import importlib.util as _ilu
import os.path as _osp

_spec = _ilu.spec_from_file_location(
    "_base_cfg", _osp.join(_osp.dirname(__file__), "orientedreppoints_r50_demo.py")
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
lr_config = _base.lr_config
checkpoint_config = _base.checkpoint_config
log_config = _base.log_config
total_epochs = _base.total_epochs
log_level = _base.log_level
load_from = _base.load_from
resume_from = _base.resume_from
tpu = _base.tpu

work_dir = "work_dirs/orientedreppoints_r50_mosaic/"

train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="CorrectBox", correct_rbbox=True, refine_rbbox=True),
    # 4-image mosaic with random affine crop back to tile size, then mixup
    # of two independent mosaics (Beta(8,8) blend)
    dict(
        type="PolyMosaic",
        degrees=0, translate=0.1, scale=0.25, shear=0,
        perspective=0.0, ifcrop=True, mosaic_ratio=0.5,
    ),
    dict(type="MixUp", mixup_ratio=0.3),
    dict(
        type="RotateResize",
        img_scale=[(1333, 768), (1333, 1280)],
        keep_ratio=True,
        multiscale_mode="range",
        clamp_rbbox=False,
    ),
    dict(type="RotateRandomFlip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
]

data = dict(
    imgs_per_gpu=2,
    workers_per_gpu=2,
    train=dict(
        type=dataset_type,
        ann_file=data_root + "trainval_split/trainval_dota.json",
        img_prefix=data_root + "trainval_split/images/",
        pipeline=train_pipeline,
    ),
    val=_base.data["val"],
    test=_base.data["test"],
)
