# HRSC-shaped synthetic benchmark (ship-only scenes), full aug recipe.
#
# Round 2 trained the HRSC-shaped run with the plain pipeline (AP07 0.909,
# SYNTH_EVAL_HRSC_r02); the round-3 aug recipe (mosaic+mixup+HSV+rotate,
# 3x scenes, longer schedule) recovered every hard-benchmark tail, so this
# config applies the same recipe to the ship-only run — reference recipe
# anchor: configs/dota/orientedrepoints_swin_tiny_demo.py:80-89.
# Run via tools/synth_benchmark.py --hrsc --config <this>.
#
# Inherits everything from synth_r18_512_hard_aug.py; single-class scenes
# need less schedule than the 15-class hard benchmark.

import importlib.util as _ilu
import os.path as _osp

_spec = _ilu.spec_from_file_location(
    "_base_cfg", _osp.join(_osp.dirname(__file__),
                           "synth_r18_512_hard_aug.py")
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
train_pipeline = _base.train_pipeline
test_pipeline = _base.test_pipeline
evaluation = _base.evaluation
optimizer = _base.optimizer
optimizer_config = _base.optimizer_config
checkpoint_config = _base.checkpoint_config
log_config = _base.log_config
log_level = _base.log_level
data = _base.data
tpu = _base.tpu
load_from = None
resume_from = None

lr_config = dict(
    policy="step",
    warmup="linear",
    warmup_iters=300,
    warmup_ratio=1.0 / 3,
    step=[45, 54],
)
total_epochs = 60
work_dir = "work_dirs/synth_hrsc_aug/"
