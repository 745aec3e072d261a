"""DOTA dataset: COCO-poly JSON reader (pycocotools-free).

Reference parity:
  * 15 DOTA classes in the reference order (mmdet/datasets/dota.py:8-12);
  * annotations produced by DOTA2COCO_poly (bbox = 8-coord polygon,
    DOTA_devkit/DOTA2COCO_poly.py:63-74);
  * _parse_ann_info keeps polys, labels 1-based, skips iscrowd
    (dota.py:44-82); images without annotations are filtered during
    training (CustomDataset._filter_imgs semantics);
  * aspect-ratio group flag for grouped batching (custom.py `_set_group_flag`).
"""

from __future__ import annotations

import json
import os.path as osp

import numpy as np

DOTA_CLASSES = (
    "plane", "baseball-diamond", "bridge", "ground-track-field",
    "small-vehicle", "large-vehicle", "ship", "tennis-court",
    "basketball-court", "storage-tank", "soccer-ball-field", "roundabout",
    "harbor", "swimming-pool", "helicopter",
)

HRSC_CLASSES = ("ship",)


class DotaDataset:
    CLASSES = DOTA_CLASSES

    def __init__(
        self,
        ann_file: str,
        img_prefix: str = "",
        pipeline=None,
        test_mode: bool = False,
        filter_empty: bool = True,
    ):
        self.ann_file = ann_file
        self.img_prefix = img_prefix
        self.test_mode = test_mode
        with open(ann_file) as f:
            coco = json.load(f)
        self.cat_id_to_label = {
            c["id"]: i + 1 for i, c in enumerate(coco["categories"])
        }
        anns_by_img = {}
        for a in coco.get("annotations", []):
            anns_by_img.setdefault(a["image_id"], []).append(a)
        self.img_infos = []
        self.anns = []
        for img in coco["images"]:
            anns = anns_by_img.get(img["id"], [])
            polys, labels, difficult = [], [], []
            for a in anns:
                if a.get("iscrowd", 0):
                    continue
                bbox = np.asarray(a["bbox"], np.float32).reshape(-1)
                if bbox.size != 8:
                    continue
                polys.append(bbox)
                labels.append(self.cat_id_to_label[a["category_id"]])
                difficult.append(int(a.get("difficult", 0)))
            if filter_empty and not test_mode and len(polys) == 0:
                continue
            self.img_infos.append(img)
            self.anns.append(
                dict(
                    bboxes=(
                        np.stack(polys)
                        if polys
                        else np.zeros((0, 8), np.float32)
                    ),
                    labels=np.asarray(labels, np.int64),
                    difficult=np.asarray(difficult, np.int64),
                )
            )
        # aspect-ratio group flag (w/h > 1 -> group 1)
        self.flag = np.array(
            [int(i["width"] / i["height"] > 1) for i in self.img_infos],
            dtype=np.uint8,
        )
        self.pipeline = pipeline

    def __len__(self):
        return len(self.img_infos)

    def get_raw(self, idx):
        return dict(
            img_info=self.img_infos[idx],
            ann_info=self.anns[idx],
            img_prefix=self.img_prefix,
        )

    def __getitem__(self, idx):
        results = self.get_raw(idx)
        if self.pipeline is None:
            return results
        from .pipelines import MultiSamplePipeline

        if isinstance(self.pipeline, MultiSamplePipeline):
            # mosaic/mixup pipelines pull extra random samples (the
            # reference indexes the dataset from inside poly_transforms)
            rng = np.random
            return self.pipeline(
                results,
                getter=lambda: self.get_raw(rng.randint(len(self))),
            )
        return self.pipeline(results)


class HrscDataset(DotaDataset):
    CLASSES = HRSC_CLASSES
