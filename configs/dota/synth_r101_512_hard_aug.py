# R-101 on the HARD synthetic benchmark with the full aug recipe — the
# last reference headline backbone (reference README.md:30, 76.52 mAP,
# configs/dota/orientedrepoints_r101_demo.py) without a converged quality
# artifact (VERDICT r4 item 5).  Model surface mirrors the reference's
# r101 demo backbone block (depth=101) but trained from scratch
# (frozen_stages=-1) because the synthetic task has no ImageNet init in
# this environment.  Everything else matches the R-50 run so per-class
# deltas isolate capacity.

import importlib.util as _ilu
import os.path as _osp

_spec = _ilu.spec_from_file_location(
    "_base_cfg", _osp.join(_osp.dirname(__file__), "synth_r50_512_hard_aug.py")
)
_base = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_base)

norm_cfg = _base.norm_cfg
model = dict(_base.model)
model["backbone"] = dict(type="ResNet", depth=101, frozen_stages=-1)
train_cfg = _base.train_cfg
test_cfg = _base.test_cfg
dataset_type = _base.dataset_type
data_root = _base.data_root
img_norm_cfg = _base.img_norm_cfg
train_pipeline = _base.train_pipeline
test_pipeline = _base.test_pipeline
data = _base.data
evaluation = _base.evaluation
optimizer = _base.optimizer
optimizer_config = _base.optimizer_config
lr_config = _base.lr_config
total_epochs = _base.total_epochs
checkpoint_config = _base.checkpoint_config
log_config = _base.log_config
log_level = _base.log_level
load_from = None
resume_from = None

work_dir = "work_dirs/synth_r101_512_hard_aug/"

tpu = dict(_base.tpu)
