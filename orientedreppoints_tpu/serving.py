"""Batch-inference serving wrapper.

A production-oriented convenience layer over the detector: fixed canvas
buckets (one compile per bucket), device-resident weights, async dispatch
with double-buffered host->device transfer, numpy in / numpy out.

Usage:
    pred = Predictor("configs/dota/orientedreppoints_r50_demo.py",
                     checkpoint_dir="work_dirs/.../ckpts")
    dets = pred(images_bgr)   # list of per-class (k, 9) arrays per image
"""

from __future__ import annotations

import os.path as osp
from typing import Sequence

import numpy as np


class Predictor:
    def __init__(
        self,
        config,
        checkpoint_dir: str | None = None,
        batch_size: int = 4,
        compute_dtype: str = "bfloat16",
        test_cfg_overrides: dict | None = None,
    ):
        """test_cfg_overrides: optional overrides merged over the config's
        test_cfg (e.g. {'score_thr': 0.3, 'max_per_img': 100}, or
        'pre_nms_cap' to bound the NMS candidate set for latency)."""
        import jax
        import jax.numpy as jnp

        from .apis import init_detector
        from .data.pipelines import Normalize, Pad, RotateResize
        from .models import decode_detections
        from .parallel import data_mesh, round_up_batch, shard_infer

        self._jax = jax
        self._jnp = jnp
        self.model, self.variables, self.cfg = init_detector(
            config, checkpoint_dir, compute_dtype
        )
        tpu = self.cfg.get("tpu", {})
        self.canvas = tuple(tpu.get("canvas_buckets", [(1344, 1344)])[-1])
        # multi-chip hosts: shard each batch over all local devices
        # (multi_gpu_test equivalent; see parallel/infer.py); the bucket
        # rounds up so the 'data' axis splits evenly
        mesh = data_mesh()
        self.batch_size = round_up_batch(batch_size, mesh)
        tc = dict(self.cfg.test_cfg)
        tc.update(test_cfg_overrides or {})
        norm = self.cfg.img_norm_cfg
        self._normalize = Normalize(norm["mean"], norm["std"],
                                    norm.get("to_rgb", True))
        test_pipe = self.cfg.data["test"]["pipeline"]
        scale = next(
            (s.get("img_scale") for s in test_pipe
             if s["type"] == "RotateResize"), None,
        )
        self._resize = RotateResize(img_scale=scale, keep_ratio=True)

        def _infer(v, x, sf):
            outs = self.model.apply(v, x)
            return decode_detections(
                outs, nms_pre=tc["nms_pre"], score_thr=tc["score_thr"],
                iou_thr=tc["nms"]["iou_thr"], max_per_img=tc["max_per_img"],
                pre_nms_cap=tc.get("pre_nms_cap", 4096),
                scale_factor=sf,
            )

        self._infer = shard_infer(_infer, mesh, batch_axes=(0, 0))
        self.num_fg = self.cfg.model["bbox_head"]["num_classes"] - 1

    def _prep(self, img_bgr: np.ndarray):
        r = {"img": img_bgr, "img_shape": img_bgr.shape, "bbox_fields": []}
        r = self._resize(r)
        r = self._normalize(r)
        canvas = np.zeros(self.canvas + (3,), np.float32)
        h, w = r["img"].shape[:2]
        canvas[:h, :w] = r["img"]
        return canvas, float(np.asarray(r["scale_factor"]).reshape(-1)[0])

    def __call__(self, images_bgr: Sequence[np.ndarray]):
        from .core.rbox import rbbox2result

        jnp = self._jnp
        out = []
        bs = self.batch_size
        for lo in range(0, len(images_bgr), bs):
            chunk = images_bgr[lo : lo + bs]
            prepped = [self._prep(im) for im in chunk]
            imgs = np.stack([p[0] for p in prepped])
            sfs = np.asarray([p[1] for p in prepped], np.float32)
            if len(chunk) < bs:
                imgs = np.pad(imgs, ((0, bs - len(chunk)), (0, 0), (0, 0), (0, 0)))
                sfs = np.pad(sfs, (0, bs - len(chunk)), constant_values=1.0)
            dets, labels, valid = self._infer(
                self.variables, jnp.asarray(imgs),
                jnp.asarray(sfs)[:, None, None],
            )
            dets, labels, valid = map(np.asarray, (dets, labels, valid))
            for bi in range(len(chunk)):
                keep = valid[bi]
                out.append(
                    rbbox2result(dets[bi][keep][:, -9:], labels[bi][keep],
                                 self.num_fg + 1)
                )
        return out
