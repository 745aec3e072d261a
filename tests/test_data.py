"""Data pipeline tests: dataset reading, transforms, collation."""

import json
import os

import cv2
import numpy as np
import pytest

from orientedreppoints_tpu.data.dota import DOTA_CLASSES, DotaDataset
from orientedreppoints_tpu.data.loader import DataLoader, collate
from orientedreppoints_tpu.data.pipelines import (
    CorrectBox,
    HSVAugment,
    Normalize,
    Pad,
    RotateRandomFlip,
    RotateResize,
    build_pipeline,
)


@pytest.fixture(scope="module")
def tiny_dota(tmp_path_factory):
    root = tmp_path_factory.mktemp("dota")
    imgdir = root / "images"
    imgdir.mkdir()
    rng = np.random.RandomState(3)
    images, annotations = [], []
    categories = [
        {"id": i + 1, "name": n, "supercategory": n}
        for i, n in enumerate(DOTA_CLASSES)
    ]
    ann_id = 1
    for img_id in range(1, 4):
        h, w = 256, 320
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        name = f"P{img_id:04d}.png"
        cv2.imwrite(str(imgdir / name), img)
        images.append(
            {"file_name": name, "id": img_id, "width": w, "height": h}
        )
        for _ in range(rng.randint(1, 5)):
            cx, cy = rng.rand(2) * [w - 80, h - 80] + 40
            bw, bh = rng.rand(2) * 30 + 10
            a = rng.rand() * np.pi
            c, s = np.cos(a), np.sin(a)
            r = np.array(
                [[-bw/2, -bh/2], [bw/2, -bh/2], [bw/2, bh/2], [-bw/2, bh/2]]
            )
            poly = ((r @ [[c, s], [-s, c]]) + [cx, cy]).reshape(-1)
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": img_id,
                    "category_id": int(rng.randint(1, 16)),
                    "bbox": [float(v) for v in poly],
                    "segmentation": [[float(v) for v in poly]],
                    "iscrowd": 0,
                    "area": float(bw * bh),
                }
            )
            ann_id += 1
    ann_file = root / "train.json"
    with open(ann_file, "w") as f:
        json.dump(
            {"images": images, "annotations": annotations,
             "categories": categories}, f,
        )
    return str(ann_file), str(imgdir)


TRAIN_PIPELINE = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="CorrectBox", correct_rbbox=True, refine_rbbox=True),
    dict(
        type="RotateResize",
        img_scale=[(333, 192), (333, 320)],
        keep_ratio=True,
        multiscale_mode="range",
        clamp_rbbox=False,
    ),
    dict(type="RotateRandomFlip", flip_ratio=0.5),
    dict(
        type="Normalize",
        mean=[123.675, 116.28, 103.53],
        std=[58.395, 57.12, 57.375],
        to_rgb=True,
    ),
    dict(type="Pad", size_divisor=32),
]


class TestDataset:
    def test_load(self, tiny_dota):
        ann, imgs = tiny_dota
        ds = DotaDataset(ann, imgs)
        assert len(ds) == 3
        raw = ds.get_raw(0)
        assert raw["ann_info"]["bboxes"].shape[1] == 8
        assert raw["ann_info"]["labels"].min() >= 1

    def test_full_pipeline(self, tiny_dota):
        ann, imgs = tiny_dota
        ds = DotaDataset(ann, imgs, pipeline=build_pipeline(TRAIN_PIPELINE))
        out = ds[0]
        assert out["img"].ndim == 3
        assert out["img"].shape[0] % 32 == 0
        assert out["img"].shape[1] % 32 == 0
        assert out["gt_bboxes"].shape[1] == 8

    def test_loader_batches(self, tiny_dota):
        ann, imgs = tiny_dota
        ds = DotaDataset(ann, imgs, pipeline=build_pipeline(TRAIN_PIPELINE))
        dl = DataLoader(ds, batch_size=2, canvas_buckets=[(352, 352)], max_gt=16)
        batches = list(dl)
        assert len(batches) >= 1
        b = batches[0]
        assert b["images"].shape == (2, 352, 352, 3)
        assert b["gt_polys"].shape == (2, 16, 8)
        assert b["gt_valid"].any()
        assert (b["img_hw"] <= 352).all()


class TestTransforms:
    def test_correctbox_snaps_to_minarearect(self, rng):
        # a noisy quad -> corrected poly must equal cv2 minAreaRect corners
        poly = np.array([10.3, 10.1, 50.2, 12.4, 48.9, 40.2, 9.1, 38.8],
                        np.float32)
        results = {"gt_bboxes": poly[None]}
        out = CorrectBox(correct_rbbox=True, refine_rbbox=False)(results)
        got = out["gt_bboxes"][0].reshape(4, 2)
        rect = cv2.minAreaRect(poly.astype(np.int64).reshape(4, 2).astype(np.float32))
        expect = cv2.boxPoints(rect)
        # same vertex set (order may differ by cyclic shift)
        d = np.abs(got[:, None] - expect[None]).sum(-1)
        assert (d.min(axis=1) < 1e-3).all()

    def test_flip_involutive(self, rng):
        img = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
        polys = rng.rand(3, 8).astype(np.float32) * 60
        r = {
            "img": img, "img_shape": img.shape, "gt_bboxes": polys.copy(),
            "bbox_fields": ["gt_bboxes"], "flip": True,
            "flip_direction": "horizontal",
        }
        t = RotateRandomFlip(flip_ratio=1.0)
        out = t(dict(r))
        out2 = t(
            {**out, "flip": True, "flip_direction": "horizontal",
             "img_shape": img.shape}
        )
        np.testing.assert_allclose(out2["gt_bboxes"], polys, atol=1e-4)
        np.testing.assert_array_equal(out2["img"], img)

    def test_resize_scales_polys(self, rng):
        img = (rng.rand(100, 200, 3) * 255).astype(np.uint8)
        polys = np.array([[10, 10, 50, 10, 50, 30, 10, 30]], np.float32)
        r = {
            "img": img, "img_shape": img.shape, "gt_bboxes": polys,
            "bbox_fields": ["gt_bboxes"],
        }
        out = RotateResize(img_scale=(400, 200), keep_ratio=True)(r)
        assert out["scale_factor"] == pytest.approx(2.0)
        np.testing.assert_allclose(out["gt_bboxes"], polys * 2.0)

    def test_normalize_pad(self, rng):
        img = (rng.rand(50, 70, 3) * 255).astype(np.uint8)
        r = {"img": img, "img_shape": img.shape, "bbox_fields": []}
        out = Normalize([123.675, 116.28, 103.53], [58.395, 57.12, 57.375])(r)
        out = Pad(size_divisor=32)(out)
        assert out["img"].shape == (64, 96, 3)
        assert out["img"].dtype == np.float32

    def test_hsv_preserves_shape(self, rng):
        img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        out = HSVAugment()({"img": img})
        assert out["img"].shape == (32, 32, 3)
        assert out["img"].dtype == np.uint8
