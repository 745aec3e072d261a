# OrientedRepPoints SSD-VGG16(512) + FPN on DOTA-v1.0 1024x1024 patches.
# The reference registers SSDVGG (mmdet/models/backbones/ssd_vgg.py:55-153)
# but ships no oriented config for it; this pairs it with the oriented
# path: the @512 tower's first five maps land exactly on the head's
# point_strides 8/16/32/64/128, so the FPN uses start_level 0 and no
# extra levels.

norm_cfg = dict(type="GN", num_groups=32, requires_grad=True)

model = dict(
    type="OrientedRepPointsDetector",
    backbone=dict(
        type="SSDVGG",
        input_size=512,
        depth=16,
        l2_norm_scale=20.0,
    ),
    neck=dict(
        type="FPN",
        in_channels=[512, 1024, 512, 256, 256],
        out_channels=256,
        start_level=0,
        add_extra_convs=False,
        num_outs=5,
        norm_cfg=norm_cfg,
    ),
    bbox_head=dict(
        type="OrientedRepPointsHead",
        num_classes=16,
        in_channels=256,
        feat_channels=256,
        point_feat_channels=256,
        stacked_convs=3,
        num_points=9,
        gradient_mul=0.3,
        point_strides=[8, 16, 32, 64, 128],
        point_base_scale=2,
        norm_cfg=norm_cfg,
        loss_cls=dict(
            type="FocalLoss", use_sigmoid=True, gamma=2.0, alpha=0.25,
            loss_weight=1.0,
        ),
        loss_rbox_init=dict(type="GIoULoss", loss_weight=0.375),
        loss_rbox_refine=dict(type="GIoULoss", loss_weight=1.0),
        loss_spatial_init=dict(type="SpatialBorderLoss", loss_weight=0.05),
        loss_spatial_refine=dict(type="SpatialBorderLoss", loss_weight=0.1),
        top_ratio=0.4,
    ),
)

train_cfg = dict(
    init=dict(
        assigner=dict(type="PointAssigner", scale=4, pos_num=1),
        allowed_border=-1,
        pos_weight=-1,
    ),
    refine=dict(
        assigner=dict(
            type="MaxIoUAssigner",
            pos_iou_thr=0.1,
            neg_iou_thr=0.1,
            min_pos_iou=0,
            ignore_iof_thr=-1,
        ),
        allowed_border=-1,
        pos_weight=-1,
    ),
)

test_cfg = dict(
    nms_pre=2000,
    min_bbox_size=0,
    score_thr=0.05,
    nms=dict(type="rnms", iou_thr=0.4),
    max_per_img=2000,
)

dataset_type = "DotaDataset"
data_root = "data/dota_1024/"
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True
)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="CorrectBox", correct_rbbox=True, refine_rbbox=True),
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
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="RotateResize", img_scale=(1333, 1024), keep_ratio=True),
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
    val=dict(
        type=dataset_type,
        ann_file=data_root + "test_split/test_dota.json",
        img_prefix=data_root + "test_split/images/",
        pipeline=test_pipeline,
    ),
    test=dict(
        type=dataset_type,
        ann_file=data_root + "test_split/test_dota.json",
        img_prefix=data_root + "test_split/images/",
        pipeline=test_pipeline,
    ),
)
evaluation = dict(interval=1, metric="bbox")

optimizer = dict(type="SGD", lr=0.008, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(
    policy="step",
    warmup="linear",
    warmup_iters=500,
    warmup_ratio=1.0 / 3,
    step=[24, 32, 38],
)
checkpoint_config = dict(interval=1)
log_config = dict(interval=50)
total_epochs = 40
log_level = "INFO"
work_dir = "work_dirs/orientedreppoints_ssd_vgg16_demo/"
load_from = None
resume_from = None

# TPU runtime extensions (no reference analogue)
tpu = dict(
    # normalize raw uint8 canvases on device (4x less H2D feed traffic);
    # parallel.train.device_normalize, equivalence-tested
    device_normalize=True,
    global_batch_size=8,  # 2 imgs/device x 4 devices in the reference recipe
    mesh_axes=("data",),
    compute_dtype="bfloat16",
    canvas_buckets=[(1344, 1344)],
    max_gt=512,
    max_pos=1024,
)
