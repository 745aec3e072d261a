# Swin-Tiny on the HARD synthetic benchmark with the full aug recipe —
# the Swin counterpart of synth_r18_512_hard_aug.py (VERDICT r2 item 4:
# "a Swin run" on the trendable hard benchmark).  Model/optimizer surface
# from synth_swin_512.py (AdamW, no-decay keys, drop-path); data +
# mosaic/mixup/HSV/PolyRandomRotate pipeline from the hard-aug config.

import importlib.util as _ilu
import os.path as _osp


def _load(name):
    spec = _ilu.spec_from_file_location(
        "_base_" + name, _osp.join(_osp.dirname(__file__), name + ".py")
    )
    mod = _ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_swin = _load("synth_swin_512")
_hard = _load("synth_r18_512_hard_aug")

norm_cfg = _swin.norm_cfg
model = _swin.model
train_cfg = _swin.train_cfg
test_cfg = _swin.test_cfg
dataset_type = _hard.dataset_type
data_root = _hard.data_root
img_norm_cfg = _hard.img_norm_cfg
train_pipeline = _hard.train_pipeline
test_pipeline = _hard.test_pipeline
data = _hard.data
evaluation = _hard.evaluation
optimizer = _swin.optimizer
optimizer_config = _swin.optimizer_config
lr_config = _hard.lr_config
checkpoint_config = _hard.checkpoint_config
log_config = _hard.log_config
total_epochs = _hard.total_epochs
log_level = "INFO"
load_from = None
resume_from = None

work_dir = "work_dirs/synth_swin_512_hard_aug/"

tpu = dict(
    # normalize raw uint8 canvases on device (4x less H2D feed traffic);
    # parallel.train.device_normalize, equivalence-tested
    device_normalize=True,
    global_batch_size=8,
    mesh_axes=("data",),
    compute_dtype="bfloat16",
    canvas_buckets=[(512, 512)],
    max_gt=128,
    max_pos=512,
)
