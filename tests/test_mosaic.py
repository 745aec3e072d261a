"""Mosaic / MixUp multi-sample pipeline tests (VERDICT r1 items #4/#5).

Correctness property for the affine-crop: every surviving gt poly must
still sit on top of its object's pixels — objects are drawn as unique
solid colors, so sampling the output image at each output poly center
must return the color of that poly's class.
"""

import numpy as np
import pytest

from orientedreppoints_tpu.data.pipelines import (
    MixUp,
    MultiSamplePipeline,
    PolyMosaic,
    PolyMosaic9,
    build_pipeline,
)

# label -> BGR solid color
COLORS = {1: (255, 0, 0), 2: (0, 255, 0), 3: (0, 0, 255), 4: (255, 255, 0),
          5: (255, 0, 255), 6: (0, 255, 255), 7: (200, 200, 200),
          8: (100, 50, 150), 9: (50, 150, 100)}


def make_sample(rng, size=128, n_obj=3, label_offset=0):
    import cv2

    img = np.zeros((size, size, 3), np.uint8)
    polys, labels = [], []
    for j in range(n_obj):
        lab = (label_offset + j) % len(COLORS) + 1
        w, h = rng.randint(24, 40), rng.randint(14, 24)
        cx = rng.randint(w, size - w)
        cy = rng.randint(h, size - h)
        a = rng.rand() * np.pi
        c, s = np.cos(a), np.sin(a)
        r = (np.array([[-w/2, -h/2], [w/2, -h/2], [w/2, h/2], [-w/2, h/2]])
             @ [[c, s], [-s, c]]) + [cx, cy]
        cv2.fillPoly(img, [np.round(r).astype(np.int32)], COLORS[lab])
        polys.append(r.reshape(-1).astype(np.float32))
        labels.append(lab)
    return dict(
        img=img, img_shape=img.shape,
        gt_bboxes=np.stack(polys), gt_labels=np.asarray(labels, np.int64),
    )


def count_polys_on_pixels(out):
    """Count polys whose center pixel carries their class color. Objects
    cut at tile borders keep their full (shifted) poly — reference
    semantics filter only by center-in-bounds — so individual misses are
    expected; callers assert an aggregate hit rate."""
    img = out["img"]
    h, w = img.shape[:2]
    hits = total = 0
    for poly, lab in zip(out["gt_bboxes"], out["gt_labels"]):
        cx = int(np.clip(poly[0::2].mean(), 0, w - 1))
        cy = int(np.clip(poly[1::2].mean(), 0, h - 1))
        total += 1
        hits += tuple(int(v) for v in img[cy, cx]) == COLORS[int(lab)]
    return hits, total


class TestPolyMosaic:
    def test_mosaic4_geometry_consistency(self, rng):
        np.random.seed(0)
        m = PolyMosaic(degrees=0, translate=0, scale=0, shear=0,
                       perspective=0.0, ifcrop=True, mosaic_ratio=1.0)
        hits = total = 0
        for trial in range(8):
            samples = [make_sample(rng, label_offset=i * 3) for i in range(4)]
            out = m(samples)
            if out is None:
                continue
            assert out["img"].shape == (128, 128, 3)
            h, t = count_polys_on_pixels(out)
            hits, total = hits + h, total + t
        assert total >= 8
        assert hits / total >= 0.65, (hits, total)

    def test_mosaic4_with_affine(self, rng):
        np.random.seed(1)
        m = PolyMosaic(degrees=10, translate=0.1, scale=0.2, shear=2,
                       perspective=0.0, ifcrop=True, mosaic_ratio=1.0)
        ran = hits = total = 0
        for trial in range(8):
            samples = [make_sample(rng, label_offset=i * 3) for i in range(4)]
            out = m(samples)
            if out is None:
                continue
            ran += 1
            # rotated crop: centers must still match colors (the filter
            # keeps only boxes whose center is in bounds)
            h, t = count_polys_on_pixels(out)
            hits, total = hits + h, total + t
        assert ran >= 3
        assert hits / total >= 0.55, (hits, total)

    def test_mosaic_ratio_zero_passthrough(self, rng):
        np.random.seed(2)
        m = PolyMosaic(mosaic_ratio=0.0)
        samples = [make_sample(rng) for _ in range(4)]
        out = m(samples)
        assert out is samples[0]

    def test_mosaic9(self, rng):
        np.random.seed(3)
        m = PolyMosaic9(degrees=0, translate=0, scale=0, shear=0,
                        perspective=0.0, ifcrop=True, mosaic_ratio=1.0)
        ran = hits = total = 0
        for trial in range(8):
            samples = [make_sample(rng, label_offset=i) for i in range(9)]
            out = m(samples)
            if out is None:
                continue
            ran += 1
            assert out["img"].shape == (128, 128, 3)
            h, t = count_polys_on_pixels(out)
            hits, total = hits + h, total + t
        assert ran >= 3
        assert hits / total >= 0.6, (hits, total)


class TestMixUp:
    def test_blend_and_concat(self, rng):
        np.random.seed(4)
        m = MixUp(mixup_ratio=1.0)
        s1, s2 = make_sample(rng), make_sample(rng, label_offset=3)
        # constant background patches to measure the blend ratio
        s1["img"][:8, :8] = (200, 0, 0)
        s2["img"][:8, :8] = (0, 200, 0)
        out = m([s1, s2])
        assert len(out["gt_bboxes"]) == len(s1["gt_bboxes"]) + len(
            s2["gt_bboxes"])
        px = out["img"][4, 4].astype(np.float32)
        r = px[0] / 200.0
        assert 0.05 < r < 0.95
        assert abs(px[1] / 200.0 - (1 - r)) < 0.02  # consistent blend

    def test_partial_group_passes_through(self, rng):
        # regression: the sample materializer can come up short (upstream
        # filtering rejects candidates) and hand MixUp a 1-element group —
        # must pass through, not IndexError (crashed a 125-epoch run)
        np.random.seed(4)
        m = MixUp(mixup_ratio=1.0)
        s1 = make_sample(rng)
        out = m([s1])
        assert out is s1


class TestPipelineWiring:
    PIPE_CFG = [
        dict(type="PolyMosaic", mosaic_ratio=1.0, translate=0, scale=0),
        dict(type="MixUp", mixup_ratio=1.0),
    ]

    def test_build_pipeline_detects_fusion(self):
        pipe = build_pipeline(self.PIPE_CFG)
        assert isinstance(pipe, MultiSamplePipeline)
        assert pipe.num_samples == 8  # mixup of two 4-mosaics

    def test_plain_pipeline_unchanged(self):
        pipe = build_pipeline([dict(type="RotateRandomFlip", flip_ratio=0.0)])
        assert not isinstance(pipe, MultiSamplePipeline)

    def test_dataset_end_to_end(self, rng, tmp_path):
        """Config-driven mosaic through DotaDataset + DataLoader."""
        import cv2
        import json

        np.random.seed(5)
        imgdir = tmp_path / "images"
        imgdir.mkdir()
        coco = {"images": [], "annotations": [],
                "categories": [{"id": i + 1, "name": f"c{i}",
                                "supercategory": "x"} for i in range(15)]}
        aid = 1
        for i in range(6):
            s = make_sample(rng, label_offset=i)
            name = f"img{i}.png"
            cv2.imwrite(str(imgdir / name), s["img"])
            coco["images"].append(
                {"file_name": name, "id": i + 1, "width": 128, "height": 128})
            for poly, lab in zip(s["gt_bboxes"], s["gt_labels"]):
                coco["annotations"].append(
                    {"id": aid, "image_id": i + 1, "category_id": int(lab),
                     "bbox": [float(v) for v in poly], "iscrowd": 0,
                     "area": 100.0})
                aid += 1
        ann = tmp_path / "ann.json"
        ann.write_text(json.dumps(coco))

        from orientedreppoints_tpu.data.dota import DotaDataset
        from orientedreppoints_tpu.data.loader import DataLoader

        pipeline = build_pipeline([
            dict(type="LoadImageFromFile"),
            dict(type="LoadAnnotations", with_bbox=True),
            dict(type="PolyMosaic", mosaic_ratio=1.0, translate=0, scale=0),
            dict(type="RotateRandomFlip", flip_ratio=0.5),
            dict(type="Pad", size_divisor=32),
        ])
        ds = DotaDataset(ann_file=str(ann), img_prefix=str(imgdir),
                         pipeline=pipeline)
        got = 0
        for i in range(len(ds)):
            s = ds[i]
            if s is None:
                continue
            got += 1
            assert s["img"].shape[0] % 32 == 0
            assert len(s["gt_bboxes"]) == len(s["gt_labels"])
            assert len(s["gt_bboxes"]) > 0
        assert got >= 3

        loader = DataLoader(ds, batch_size=2, canvas_buckets=[(128, 128)],
                            max_gt=64)
        batch = next(iter(loader))
        assert batch["images"].shape == (2, 128, 128, 3)
        assert batch["gt_valid"].sum() > 0
