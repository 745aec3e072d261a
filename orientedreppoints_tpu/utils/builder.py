"""Build framework objects from mmdet-style config dicts.

Maps the reference's registry-driven `build_detector(cfg)` surface
(mmdet/models/builder.py) to our flax constructors and LossConfig.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.loss_head import LossConfig
from ..data.dota import DotaDataset, HrscDataset
from ..data.loader import DataLoader
from ..data.pipelines import build_pipeline
from ..models import OrientedRepPointsDetector

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}
_BACKBONES = {"ResNet": "resnet", "ResNeXt": "resnet",
              "SwinTransformer": "swin", "HRNet": "hrnet",
              "SSDVGG": "ssd_vgg"}
_DATASETS = {"DotaDataset": DotaDataset, "HrscDataset": HrscDataset}


def build_detector(cfg, compute_dtype: str = "bfloat16"):
    m = cfg.model
    bb = m["backbone"]
    bb_type = _BACKBONES[bb["type"]]
    kwargs = {}
    if bb_type == "swin":
        kwargs = {
            k: tuple(v) if isinstance(v, list) else v
            for k, v in bb.items()
            if k in ("embed_dim", "depths", "num_heads", "window_size",
                     "out_indices", "drop_path_rate")
        }
    if bb_type == "resnet":
        kwargs = {
            k: v for k, v in bb.items()
            if k in ("groups", "base_width", "out_indices")
        }
    if bb_type == "hrnet":
        kwargs = {k: v for k, v in bb.items() if k in ("extra",)}
    if bb_type == "ssd_vgg":
        kwargs = {
            k: v for k, v in bb.items()
            if k in ("input_size", "depth", "l2_norm_scale")
        }
    head = m["bbox_head"]
    head_kwargs = {
        k: head[k]
        for k in ("feat_channels", "point_feat_channels", "stacked_convs",
                  "num_points", "gradient_mul")
        if k in head
    }
    return OrientedRepPointsDetector(
        backbone_type=bb_type,
        depth=bb.get("depth", 50),
        num_classes=head["num_classes"],
        fpn_out_channels=m["neck"]["out_channels"],
        num_levels=m["neck"]["num_outs"],
        fpn_start_level=m["neck"].get("start_level"),
        fpn_add_extra_convs=m["neck"].get("add_extra_convs"),
        dtype=_DTYPES[compute_dtype],
        backbone_kwargs=kwargs or None,
        head_kwargs=head_kwargs or None,
    )


def build_loss_config(cfg) -> LossConfig:
    head = cfg.model["bbox_head"]
    init_as = cfg.train_cfg["init"]["assigner"]
    ref_as = cfg.train_cfg["refine"]["assigner"]
    tpu = cfg.get("tpu", {})
    return LossConfig(
        strides=tuple(head["point_strides"]),
        point_base_scale=float(head["point_base_scale"]),
        num_points=head["num_points"],
        max_pos=tpu.get("max_pos", 1024),
        top_ratio=head.get("top_ratio", 0.4),
        init_assign_scale=float(init_as["scale"]),
        init_assign_pos_num=init_as["pos_num"],
        pos_iou_thr=ref_as["pos_iou_thr"],
        neg_iou_thr=ref_as["neg_iou_thr"],
        min_pos_iou=ref_as["min_pos_iou"],
        focal_gamma=head["loss_cls"]["gamma"],
        focal_alpha=head["loss_cls"]["alpha"],
        loss_cls_weight=head["loss_cls"]["loss_weight"],
        loss_rbox_init_weight=head["loss_rbox_init"]["loss_weight"],
        loss_rbox_refine_weight=head["loss_rbox_refine"]["loss_weight"],
        loss_spatial_init_weight=head["loss_spatial_init"]["loss_weight"],
        loss_spatial_refine_weight=head["loss_spatial_refine"]["loss_weight"],
    )


def build_img_norm(cfg):
    """Device-side normalization spec (or None to keep it on host).

    When `cfg.tpu.device_normalize` is true, returns the train pipeline's
    Normalize constants as kwargs for `parallel.train.device_normalize`;
    pass the flag to `build_dataset` so the host Normalize defers.
    """
    if not cfg.get("tpu", {}).get("device_normalize", False):
        return None
    for step in cfg.data["train"]["pipeline"]:
        if step.get("type") == "Normalize":
            return dict(mean=tuple(float(m) for m in step["mean"]),
                        std=tuple(float(s) for s in step["std"]),
                        to_rgb=bool(step.get("to_rgb", True)))
    return None


def build_dataset(dcfg, device_normalize: bool = False):
    cls = _DATASETS[dcfg["type"]]
    pipeline_cfg = dcfg["pipeline"]
    if device_normalize:
        pipeline_cfg = [dict(s, device=True) if s.get("type") == "Normalize"
                        else s for s in pipeline_cfg]
    return cls(
        ann_file=dcfg["ann_file"],
        img_prefix=dcfg.get("img_prefix", ""),
        pipeline=build_pipeline(pipeline_cfg),
        test_mode=dcfg.get("test_mode", False),
    )


def build_dataloader(dataset, cfg, batch_size=None):
    tpu = cfg.get("tpu", {})
    return DataLoader(
        dataset,
        batch_size=batch_size or tpu.get("global_batch_size", 8),
        canvas_buckets=tpu.get("canvas_buckets", [(1344, 1344)]),
        max_gt=tpu.get("max_gt", 512),
    )
