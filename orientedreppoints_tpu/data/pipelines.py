"""Host-side data pipeline: polygon-aware transforms on a results dict.

Reference parity (mmdet/datasets/pipelines/{loading,transforms}.py):
  * LoadImageFromFile / LoadAnnotations — BGR image + (n, 8) gt polys
    (loading.py:11,84; DotaDataset keeps the 8-coord polygon bbox,
    mmdet/datasets/dota.py:44-82);
  * CorrectBox — snap each gt poly to cv2.minAreaRect corners (int64 cast
    first!), optional first-point refinement picking the corner closest to
    the original first point (transforms.py:43-82);
  * RotateResize — multiscale 'range' sampling of (long, short) edges,
    keep-ratio rescale, scale_factor applied to polys, optional clamping
    (transforms.py:85-200);
  * RotateRandomFlip — poly-aware flip with the `dim - x - 1` convention
    (transforms.py:203-270);
  * HSVAugment — hue/sat/val LUT gains (transforms.py:1156-1215);
  * Normalize (mean/std, BGR->RGB) and Pad to size_divisor=32.

Each transform is a callable class over the results dict; `build_pipeline`
assembles them from mmdet-style {'type': ...} config dicts so reference
configs can be reused nearly verbatim.
"""

from __future__ import annotations

import os.path as osp
from typing import Any, Sequence

import cv2
import numpy as np

PIPELINES = {}


def register(cls):
    PIPELINES[cls.__name__] = cls
    return cls


def _compose(steps):
    def run(results):
        for s in steps:
            results = s(results)
            if results is None:
                return None
        return results

    return run


def build_pipeline(cfgs: Sequence[dict]):
    """Build a pipeline callable from mmdet-style config dicts.

    If the config contains multi-sample fusion stages (PolyMosaic /
    PolyMosaic9 / MixUp), returns a MultiSamplePipeline — the dataset then
    feeds it extra random samples (reference enables these via
    poly_transforms entries in the train pipeline, Poly_Mosaic_
    RandomPerspective / MixUp, poly_transforms.py:548-1023).
    """
    steps = []
    for cfg in cfgs:
        cfg = dict(cfg)
        t = cfg.pop("type")
        steps.append(PIPELINES[t](**cfg))

    fusion_idx = [
        i for i, s in enumerate(steps) if getattr(s, "NUM_SAMPLES", 1) > 1
    ]
    if not fusion_idx:
        return _compose(steps)
    first, last = fusion_idx[0], fusion_idx[-1]
    assert fusion_idx == list(range(first, last + 1)), (
        "fusion stages (PolyMosaic/MixUp) must be contiguous in the pipeline"
    )
    return MultiSamplePipeline(
        pre=_compose(steps[:first]),
        fusions=steps[first : last + 1],
        post=_compose(steps[last + 1 :]),
    )


@register
class LoadImageFromFile:
    """Image loader with an optional decoded-image RAM cache.

    cache=True keeps decoded arrays keyed by path (bounded FIFO); on this
    class of host the PNG decode is ~13 ms/tile and multi-sample pipelines
    (mosaic x mixup) load 8 images per output sample, so caching removes
    the dominant host cost of the aug recipe.  Cached entries are returned
    as copies — downstream transforms may mutate `results["img"]`.
    """

    _cache: dict = {}

    def __init__(self, to_float32: bool = False, cache: bool = False,
                 cache_max_items: int = 4096):
        self.to_float32 = to_float32
        self.cache = cache
        self.cache_max_items = cache_max_items

    def _read(self, path):
        if not self.cache:
            return cv2.imread(path)  # BGR, like mmcv.imread
        img = self._cache.get(path)
        if img is None:
            img = cv2.imread(path)
            if img is None:
                return None
            if len(self._cache) < self.cache_max_items:
                self._cache[path] = img.copy()
            return img
        return img.copy()

    def __call__(self, results):
        path = osp.join(results.get("img_prefix", ""), results["img_info"]["file_name"])
        img = self._read(path)
        if img is None:
            raise FileNotFoundError(path)
        if self.to_float32:
            img = img.astype(np.float32)
        results["filename"] = path
        results["img"] = img
        results["img_shape"] = img.shape
        results["ori_shape"] = img.shape
        results["bbox_fields"] = []
        return results


@register
class Corrupt:
    """Apply an image corruption right after load (robustness benchmark).

    Mirrors the reference's Corrupt transform
    (mmdet/datasets/pipelines/transforms.py:979-998), which
    tools/test_robustness.py:326-330 inserts into the test pipeline per
    (corruption, severity) setting; the corruption library itself is
    data/corruptions.py (imagecorruptions-equivalent, seeded)."""

    def __init__(self, corruption: str, severity: int = 1, seed: int = 0):
        self.corruption = corruption
        self.severity = severity
        self.seed = seed

    def __call__(self, results):
        from .corruptions import corrupt

        if self.severity <= 0:
            return results
        # per-image deterministic rng: same image -> same corruption
        rng = np.random.RandomState(
            (hash(results.get("filename", "")) ^ self.seed) & 0x7FFFFFFF)
        results["img"] = corrupt(
            results["img"].astype(np.uint8), self.corruption,
            self.severity, rng=rng)
        return results


@register
class LoadAnnotations:
    def __init__(self, with_bbox: bool = True):
        self.with_bbox = with_bbox

    def __call__(self, results):
        ann = results["ann_info"]
        if self.with_bbox:
            results["gt_bboxes"] = ann["bboxes"].astype(np.float32).reshape(-1, 8)
            results["gt_labels"] = ann["labels"].astype(np.int64)
            results["bbox_fields"].append("gt_bboxes")
        return results


@register
class CorrectBox:
    def __init__(self, correct_rbbox: bool = True, refine_rbbox: bool = False):
        self.correct_rbbox = correct_rbbox
        self.refine_rbbox = refine_rbbox

    def _correct_one(self, poly8):
        pts = poly8.astype(np.int64).reshape(4, 2)
        (cx, cy), (w, h), theta = cv2.minAreaRect(pts.astype(np.float32))
        rect = cv2.boxPoints(((cx, cy), (w, h), theta)).reshape(-1)
        if not self.refine_rbbox:
            return rect
        # rotate the rect corners so corner 0 is nearest the original p0
        corners = rect.reshape(4, 2)
        d = np.linalg.norm(corners - pts[0], axis=1)
        i = int(np.argmin(d))
        # tie semantics: reference keeps the LAST minimal index (uses <=)
        i = int(np.where(d <= d[i])[0][-1])
        return np.roll(corners, -i, axis=0).reshape(-1)

    def __call__(self, results):
        if self.correct_rbbox and len(results["gt_bboxes"]):
            results["gt_bboxes"] = np.stack(
                [self._correct_one(p) for p in results["gt_bboxes"]]
            ).astype(np.float32)
        return results


def imrescale(img, scale, interpolation=cv2.INTER_LINEAR):
    """mmcv.imrescale parity: fit inside (long, short) keeping aspect."""
    h, w = img.shape[:2]
    if isinstance(scale, (int, float)):
        factor = scale
    else:
        max_long, max_short = max(scale), min(scale)
        factor = min(max_long / max(h, w), max_short / min(h, w))
    new_size = (int(w * factor + 0.5), int(h * factor + 0.5))
    out = cv2.resize(img, new_size, interpolation=interpolation)
    return out, factor


@register
class RotateResize:
    def __init__(
        self,
        img_scale=None,
        multiscale_mode: str = "range",
        ratio_range=None,
        keep_ratio: bool = True,
        clamp_rbbox: bool = True,
    ):
        if img_scale is None:
            self.img_scale = None
        elif isinstance(img_scale, list):
            self.img_scale = [tuple(s) for s in img_scale]
        else:
            self.img_scale = [tuple(img_scale)]
        self.multiscale_mode = multiscale_mode
        self.ratio_range = ratio_range
        self.keep_ratio = keep_ratio
        self.clamp_rbbox = clamp_rbbox

    def _random_scale(self):
        if self.ratio_range is not None:
            lo, hi = self.ratio_range
            r = np.random.random_sample() * (hi - lo) + lo
            return int(self.img_scale[0][0] * r), int(self.img_scale[0][1] * r)
        if len(self.img_scale) == 1:
            return self.img_scale[0]
        if self.multiscale_mode == "range":
            longs = [max(s) for s in self.img_scale]
            shorts = [min(s) for s in self.img_scale]
            long_e = np.random.randint(min(longs), max(longs) + 1)
            short_e = np.random.randint(min(shorts), max(shorts) + 1)
            return (long_e, short_e)
        idx = np.random.randint(len(self.img_scale))
        return self.img_scale[idx]

    def __call__(self, results):
        scale = results.get("scale") or self._random_scale()
        if self.keep_ratio:
            img, factor = imrescale(results["img"], scale)
            scale_factor = factor
        else:
            h, w = results["img"].shape[:2]
            img = cv2.resize(results["img"], (scale[0], scale[1]))
            scale_factor = np.array(
                [scale[0] / w, scale[1] / h] * 4, np.float32
            )
        results["img"] = img
        results["img_shape"] = img.shape
        results["pad_shape"] = img.shape
        results["scale_factor"] = scale_factor
        for key in results.get("bbox_fields", []):
            b = results[key] * scale_factor
            if self.clamp_rbbox and len(b):
                b[:, 0::2] = np.clip(b[:, 0::2], 0, img.shape[1] - 1)
                b[:, 1::2] = np.clip(b[:, 1::2], 0, img.shape[0] - 1)
            results[key] = b
        return results


@register
class RotateRandomFlip:
    def __init__(self, flip_ratio=0.0, direction=("horizontal",)):
        self.flip_ratio = flip_ratio or 0.0
        self.direction = list(direction)

    def __call__(self, results):
        if "flip" not in results:
            results["flip"] = bool(np.random.rand() < self.flip_ratio)
        if "flip_direction" not in results:
            results["flip_direction"] = str(np.random.choice(self.direction))
        if results["flip"]:
            d = results["flip_direction"]
            results["img"] = (
                results["img"][:, ::-1] if d == "horizontal" else results["img"][::-1]
            ).copy()
            h, w = results["img_shape"][:2]
            for key in results.get("bbox_fields", []):
                b = results[key].copy()
                if d == "horizontal":
                    b[..., 0::2] = w - results[key][..., 0::2] - 1
                else:
                    b[..., 1::2] = h - results[key][..., 1::2] - 1
                results[key] = b
        return results


@register
class HSVAugment:
    def __init__(self, hgain=0.015, sgain=0.7, vgain=0.4):
        self.gains = (hgain, sgain, vgain)

    def __call__(self, results):
        img = results["img"]
        r = np.random.uniform(-1, 1, 3) * np.array(self.gains) + 1
        hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
        x = np.arange(0, 256, dtype=np.int16)
        lut_h = ((x * r[0]) % 180).astype(img.dtype)
        lut_s = np.clip(x * r[1], 0, 255).astype(img.dtype)
        lut_v = np.clip(x * r[2], 0, 255).astype(img.dtype)
        hsv = cv2.merge(
            (cv2.LUT(hue, lut_h), cv2.LUT(sat, lut_s), cv2.LUT(val, lut_v))
        )
        results["img"] = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
        return results


@register
class Normalize:
    def __init__(self, mean, std, to_rgb: bool = True,
                 device: bool = False):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_rgb = to_rgb
        # device=True defers the arithmetic to the accelerator: the raw
        # uint8 image flows through collation (4x less H2D traffic) and
        # parallel.train.device_normalize replicates these exact
        # semantics (BGR->RGB flip, mean/std, zero pad region) inside
        # the jitted step.  Entry points flip this on via
        # cfg.tpu.device_normalize (utils/builder.build_img_norm).
        self.device = device

    def __call__(self, results):
        results["img_norm_cfg"] = dict(
            mean=self.mean, std=self.std, to_rgb=self.to_rgb
        )
        if self.device:
            return results
        img = results["img"].astype(np.float32)
        if self.to_rgb:
            img = img[..., ::-1]
        results["img"] = (img - self.mean) / self.std
        return results


@register
class Pad:
    def __init__(self, size=None, size_divisor: int | None = None):
        self.size = size
        self.size_divisor = size_divisor

    def __call__(self, results):
        img = results["img"]
        if self.size is not None:
            th, tw = self.size
        else:
            d = self.size_divisor
            th = int(np.ceil(img.shape[0] / d)) * d
            tw = int(np.ceil(img.shape[1] / d)) * d
        out = np.zeros((th, tw) + img.shape[2:], dtype=img.dtype)
        out[: img.shape[0], : img.shape[1]] = img
        results["img"] = out
        results["pad_shape"] = out.shape
        return results


@register
class FilterEmpty:
    """Drop samples with no gt (CustomDataset skips empty-ann images)."""

    def __call__(self, results):
        if len(results.get("gt_bboxes", [])) == 0:
            return None
        return results


@register
class PolyRandomRotate:
    """Arbitrary-angle rotation with poly->rbox filtering.

    Reference parity (poly_transforms.py:348-471): rotate with probability
    rotate_ratio by angle ~ U(-angles_range, angles_range) degrees around
    the image center (auto_bound expands the canvas); polys are transformed,
    converted to rboxes, filtered (center inside bounds, w > 5, h > 5),
    and re-emitted as polys; samples losing all gts are dropped (the
    reference returns None, which our loader skips).
    """

    def __init__(self, rotate_ratio=0.5, angles_range=180, auto_bound=False):
        self.rotate_ratio = rotate_ratio
        self.angles_range = angles_range
        self.auto_bound = auto_bound

    def __call__(self, results):
        from ..core.rbox import poly2rbox, rbox2poly

        if np.random.rand() < self.rotate_ratio:
            angle = float(np.random.uniform(-self.angles_range,
                                            self.angles_range))
            results["rotate"] = True
        else:
            angle = 0.0
            results["rotate"] = False
        results["rotate_angle"] = angle

        h, w = results["img_shape"][:2]
        center = (w / 2.0, h / 2.0)
        if self.auto_bound:
            rad = np.deg2rad(angle)
            abs_cos, abs_sin = abs(np.cos(rad)), abs(np.sin(rad))
            bound_w = int(np.rint(h * abs_sin + w * abs_cos))
            bound_h = int(np.rint(h * abs_cos + w * abs_sin))
        else:
            bound_w, bound_h = w, h
        rm = cv2.getRotationMatrix2D(center, angle, 1.0)
        if self.auto_bound:
            rm[0, 2] += bound_w / 2.0 - center[0]
            rm[1, 2] += bound_h / 2.0 - center[1]

        results["img"] = cv2.warpAffine(
            results["img"], rm, (bound_w, bound_h)
        )
        results["img_shape"] = (bound_h, bound_w) + results["img"].shape[2:]

        polys = results.get("gt_bboxes", np.zeros((0, 8), np.float32))
        labels = results.get("gt_labels", np.zeros((0,), np.int64))
        if len(polys):
            pts = polys.reshape(-1, 2)
            pts = pts @ rm[:, :2].T + rm[:, 2]
            rboxes = poly2rbox(pts.reshape(-1, 8))
            keep = (
                (rboxes[:, 0] > 0) & (rboxes[:, 0] < bound_w)
                & (rboxes[:, 1] > 0) & (rboxes[:, 1] < bound_h)
                & (rboxes[:, 2] > 5) & (rboxes[:, 3] > 5)
            )
            rboxes, labels = rboxes[keep], labels[keep]
            if len(rboxes) == 0:
                return None
            results["gt_bboxes"] = rbox2poly(rboxes).astype(np.float32)
            results["gt_labels"] = labels
        return results


@register
class PolyMosaic:
    """4-image mosaic with optional random-perspective crop.

    Behavioral re-implementation of Poly_Mosaic_RandomPerspective
    (poly_transforms.py:548-966): with probability mosaic_ratio, tile 4
    samples onto a 2s x 2s canvas around a random center, offset their
    polys, then (ifcrop) apply a random affine (rotate/translate/scale/
    shear/perspective) cropping back to s x s and filter degenerate boxes
    (w, h > 5 px, center in bounds).  Input: list of 4 results dicts, fed
    by MultiSamplePipeline (build_pipeline wires it automatically when
    this stage appears in a pipeline config); output: one results dict.
    """

    NUM_SAMPLES = 4

    def __init__(self, degrees=0, translate=0, scale=0, shear=0,
                 perspective=0.0, ifcrop=True, mosaic_ratio=0.5):
        self.degrees = degrees
        self.translate = translate
        self.scale = scale
        self.shear = shear
        self.perspective = perspective
        self.ifcrop = ifcrop
        self.mosaic_ratio = mosaic_ratio

    def _mosaic4(self, results_4):
        s = max(max(r["img"].shape[:2]) for r in results_4)
        canvas = np.full((2 * s, 2 * s, 3), 114, results_4[0]["img"].dtype)
        yc = int(np.random.uniform(s * 0.5, s * 1.5))
        xc = int(np.random.uniform(s * 0.5, s * 1.5))
        polys_all, labels_all = [], []
        for i, r in enumerate(results_4):
            img = r["img"]
            h, w = img.shape[:2]
            if i == 0:  # top-left: image bottom-right corner at (xc, yc)
                x1a, y1a = max(xc - w, 0), max(yc - h, 0)
                x2a, y2a = xc, yc
                x1b, y1b = w - (x2a - x1a), h - (y2a - y1a)
                x2b, y2b = w, h
            elif i == 1:  # top-right
                x1a, y1a = xc, max(yc - h, 0)
                x2a, y2a = min(xc + w, 2 * s), yc
                x1b, y1b = 0, h - (y2a - y1a)
                x2b, y2b = x2a - x1a, h
            elif i == 2:  # bottom-left
                x1a, y1a = max(xc - w, 0), yc
                x2a, y2a = xc, min(yc + h, 2 * s)
                x1b, y1b = w - (x2a - x1a), 0
                x2b, y2b = w, y2a - y1a
            else:  # bottom-right
                x1a, y1a = xc, yc
                x2a, y2a = min(xc + w, 2 * s), min(yc + h, 2 * s)
                x1b, y1b = 0, 0
                x2b, y2b = x2a - x1a, y2a - y1a
            canvas[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
            dx, dy = x1a - x1b, y1a - y1b
            polys = r.get("gt_bboxes", np.zeros((0, 8), np.float32)).copy()
            if len(polys):
                polys[:, 0::2] += dx
                polys[:, 1::2] += dy
                polys_all.append(polys)
                labels_all.append(r.get("gt_labels", np.zeros(0, np.int64)))
        polys = (np.concatenate(polys_all) if polys_all
                 else np.zeros((0, 8), np.float32))
        labels = (np.concatenate(labels_all) if labels_all
                  else np.zeros((0,), np.int64))
        return canvas, polys, labels, s

    def _random_perspective(self, img, polys, labels, out_size):
        """yolo-style random affine crop back to out_size x out_size."""
        h, w = img.shape[:2]
        c = np.eye(3)
        c[0, 2] = -w / 2
        c[1, 2] = -h / 2
        p = np.eye(3)
        p[2, 0] = np.random.uniform(-self.perspective, self.perspective)
        p[2, 1] = np.random.uniform(-self.perspective, self.perspective)
        r = np.eye(3)
        ang = np.random.uniform(-self.degrees, self.degrees)
        sc = np.random.uniform(1 - self.scale, 1 + self.scale)
        r[:2] = cv2.getRotationMatrix2D((0, 0), ang, sc)
        sh = np.eye(3)
        sh[0, 1] = np.tan(np.deg2rad(np.random.uniform(-self.shear, self.shear)))
        sh[1, 0] = np.tan(np.deg2rad(np.random.uniform(-self.shear, self.shear)))
        t = np.eye(3)
        t[0, 2] = np.random.uniform(0.5 - self.translate, 0.5 + self.translate) * out_size
        t[1, 2] = np.random.uniform(0.5 - self.translate, 0.5 + self.translate) * out_size
        m = t @ sh @ r @ p @ c
        if self.perspective:
            img = cv2.warpPerspective(img, m, (out_size, out_size),
                                      borderValue=(114, 114, 114))
        else:
            img = cv2.warpAffine(img, m[:2], (out_size, out_size),
                                 borderValue=(114, 114, 114))
        if len(polys):
            pts = polys.reshape(-1, 2)
            pts = np.concatenate([pts, np.ones((len(pts), 1))], axis=1) @ m.T
            if self.perspective:
                pts = pts[:, :2] / pts[:, 2:3]
            else:
                pts = pts[:, :2]
            polys = pts.reshape(-1, 8).astype(np.float32)
        return img, polys, labels

    def _filter(self, polys, labels, h, w):
        if not len(polys):
            return polys, labels
        from ..core.rbox import poly2rbox, rbox2poly

        rb = poly2rbox(polys)
        keep = ((rb[:, 0] > 0) & (rb[:, 0] < w) & (rb[:, 1] > 0)
                & (rb[:, 1] < h) & (rb[:, 2] > 5) & (rb[:, 3] > 5))
        rb, labels = rb[keep], labels[keep]
        return rbox2poly(rb).astype(np.float32) if len(rb) else np.zeros(
            (0, 8), np.float32), labels

    def __call__(self, results):
        if not isinstance(results, list):
            return results
        if np.random.rand() >= self.mosaic_ratio:
            return results[0]
        canvas, polys, labels, s = self._mosaic4(results[:4])
        if self.ifcrop:
            canvas, polys, labels = self._random_perspective(
                canvas, polys, labels, s)
            h = w = s
        else:
            h = w = 2 * s
        polys, labels = self._filter(polys, labels, h, w)
        if len(polys) == 0:
            return None
        out = dict(results[0])
        out["img"] = canvas
        out["img_shape"] = canvas.shape
        out["gt_bboxes"] = polys
        out["gt_labels"] = labels
        return out


@register
class MixUp:
    """Blend two samples: img = r*img1 + (1-r)*img2, r ~ Beta(8, 8);
    gts concatenated (poly_transforms.py:969-1023)."""

    NUM_SAMPLES = 2

    def __init__(self, mixup_ratio=0.5):
        self.mixup_ratio = mixup_ratio

    def __call__(self, results):
        if not isinstance(results, list):
            return results
        # a partial group (the sample materializer can come up short when
        # upstream filtering rejects too many candidates) passes through,
        # like PolyMosaic9's len<9 guard
        if np.random.rand() >= self.mixup_ratio or len(results) < 2:
            return results[0]
        r1, r2 = results[0], results[1]
        h = max(r1["img"].shape[0], r2["img"].shape[0])
        w = max(r1["img"].shape[1], r2["img"].shape[1])

        def pad(img):
            out = np.zeros((h, w) + img.shape[2:], img.dtype)
            out[: img.shape[0], : img.shape[1]] = img
            return out

        r = np.random.beta(8.0, 8.0)
        img = pad(r1["img"]).astype(np.float32) * r + pad(
            r2["img"]).astype(np.float32) * (1 - r)
        out = dict(r1)
        out["img"] = img.astype(r1["img"].dtype)
        out["img_shape"] = img.shape
        out["gt_bboxes"] = np.concatenate(
            [r1["gt_bboxes"], r2["gt_bboxes"]], 0)
        out["gt_labels"] = np.concatenate(
            [r1["gt_labels"], r2["gt_labels"]], 0)
        return out


@register
class PolyMosaic9(PolyMosaic):
    """9-image mosaic (reference Poly_Mosaic_RandomPerspective Mosaic=9
    path, poly_transforms.py:548-966, behavioral re-implementation).

    Nine samples tile a 3s x 3s canvas on a 3x3 grid, each image anchored
    toward the center cell; a random 2s x 2s window is cropped and then the
    same random-perspective/affine step as the 4-mosaic maps it to s x s.
    """

    NUM_SAMPLES = 9

    def _mosaic9(self, results_9):
        s = max(max(r["img"].shape[:2]) for r in results_9)
        canvas = np.full((3 * s, 3 * s, 3), 114, results_9[0]["img"].dtype)
        polys_all, labels_all = [], []
        # grid order: center first, then the 8 neighbors
        cells = [(1, 1), (0, 0), (0, 1), (0, 2), (1, 0), (1, 2), (2, 0),
                 (2, 1), (2, 2)]
        for (gy, gx), r in zip(cells, results_9):
            img = r["img"]
            h, w = img.shape[:2]
            h, w = min(h, s), min(w, s)
            # anchor each image's corner nearest the center cell
            y0 = gy * s + (s - h if gy == 0 else 0)
            x0 = gx * s + (s - w if gx == 0 else 0)
            canvas[y0 : y0 + h, x0 : x0 + w] = img[:h, :w]
            polys = r.get("gt_bboxes", np.zeros((0, 8), np.float32)).copy()
            if len(polys):
                polys[:, 0::2] += x0
                polys[:, 1::2] += y0
                polys_all.append(polys)
                labels_all.append(r.get("gt_labels", np.zeros(0, np.int64)))
        polys = (np.concatenate(polys_all) if polys_all
                 else np.zeros((0, 8), np.float32))
        labels = (np.concatenate(labels_all) if labels_all
                  else np.zeros((0,), np.int64))
        # random 2s x 2s window
        yc = int(np.random.uniform(0, s))
        xc = int(np.random.uniform(0, s))
        canvas = canvas[yc : yc + 2 * s, xc : xc + 2 * s]
        if len(polys):
            polys[:, 0::2] -= xc
            polys[:, 1::2] -= yc
        return canvas, polys, labels, s

    def __call__(self, results):
        if not isinstance(results, list):
            return results
        if np.random.rand() >= self.mosaic_ratio or len(results) < 9:
            return results[0]
        canvas, polys, labels, s = self._mosaic9(results[:9])
        if self.ifcrop:
            canvas, polys, labels = self._random_perspective(
                canvas, polys, labels, s)
            h = w = s
        else:
            h, w = canvas.shape[:2]
        polys, labels = self._filter(polys, labels, h, w)
        if len(polys) == 0:
            return None
        out = dict(results[0])
        out["img"] = canvas
        out["img_shape"] = canvas.shape
        out["gt_bboxes"] = polys
        out["gt_labels"] = labels
        return out


@register
class PolyImgPlot:
    """Debug visualization stage: draw the current gt polys on the image
    and save to `img_save_path` (reference PolyImgPlot,
    poly_transforms.py:17-76). Pass-through for the pipeline."""

    _COLORS = [
        (54, 67, 244), (99, 30, 233), (176, 39, 156), (183, 58, 103),
        (181, 81, 63), (243, 150, 33), (212, 188, 0), (136, 150, 0),
        (80, 175, 76), (74, 195, 139), (57, 220, 205), (59, 235, 255),
        (0, 152, 255), (34, 87, 255), (72, 85, 121), (180, 180, 180),
    ]

    def __init__(self, img_save_path="work_dirs/pipeline_vis",
                 max_imgs: int = 100):
        self.save_path = img_save_path
        self.max_imgs = max_imgs
        self._count = 0

    def __call__(self, results):
        if results is None or self._count >= self.max_imgs:
            return results
        import os

        os.makedirs(self.save_path, exist_ok=True)
        img = np.ascontiguousarray(results["img"]).astype(np.uint8).copy()
        polys = results.get("gt_bboxes", np.zeros((0, 8), np.float32))
        labels = results.get("gt_labels", np.zeros((len(polys),), np.int64))
        for poly, lab in zip(polys, labels):
            color = self._COLORS[int(lab) % len(self._COLORS)]
            cv2.polylines(
                img, [np.round(poly).astype(np.int32).reshape(4, 2)],
                True, color, 2,
            )
        cv2.imwrite(
            osp.join(self.save_path, f"sample_{self._count:05d}.png"), img
        )
        self._count += 1
        return results


class MultiSamplePipeline:
    """Pipeline with multi-sample fusion stages (mosaic / mixup).

    The reference feeds lists of results through its pipeline when mosaic/
    mixup are enabled (poly_transforms multi-image paths); here the split
    is explicit: `pre` stages run per sample, each fusion stage consumes
    NUM_SAMPLES fused results of the previous one (e.g. [PolyMosaic,
    MixUp] mixes two independent 4-image mosaics), `post` stages run on
    the single fused result.

    The dataset calls it as pipeline(results, getter) where `getter()`
    yields a raw results dict for a random extra sample.
    """

    def __init__(self, pre, fusions, post):
        self.pre = pre
        self.fusions = fusions
        self.post = post
        n = 1
        for f in fusions:
            n *= f.NUM_SAMPLES
        self.num_samples = n

    def _materialize(self, results, getter, need):
        out = []
        r0 = self.pre(results)
        if r0 is not None:
            out.append(r0)
        tries = 0
        while len(out) < need and tries < need * 5:
            r = self.pre(getter())
            if r is not None:
                out.append(r)
            tries += 1
        return out

    def __call__(self, results, getter=None):
        if getter is None:
            raise TypeError(
                "MultiSamplePipeline needs a sample getter — use it through "
                "a dataset (DotaDataset passes one automatically)"
            )
        samples = self._materialize(results, getter, self.num_samples)
        if not samples:
            return None
        for f in self.fusions:
            n = f.NUM_SAMPLES
            groups = [samples[i : i + n] for i in range(0, len(samples), n)]
            samples = [
                r for r in (f(g) for g in groups if g) if r is not None
            ]
            if not samples:
                return None
        return self.post(samples[0])


@register
class RandomRotate:
    """Discrete-angle rotation variant (random_rotate.py:9-112): with
    probability `rate`, rotate by an angle sampled from `angles`; polys are
    transformed and filtered by center-in-bounds only (no size filter)."""

    def __init__(self, rate=0.5, angles=(30, 60, 90, 120, 150),
                 auto_bound=False):
        self.rate = rate
        self.angles = list(angles)
        self.auto_bound = auto_bound

    def __call__(self, results):
        if np.random.rand() >= self.rate:
            results["rotate"] = False
            return results
        angle = float(np.random.choice(self.angles))
        results["rotate"] = True
        results["rotate_angle"] = angle
        h, w = results["img_shape"][:2]
        center = (w / 2.0, h / 2.0)
        if self.auto_bound:
            rad = np.deg2rad(angle)
            bound_w = int(np.rint(h * abs(np.sin(rad)) + w * abs(np.cos(rad))))
            bound_h = int(np.rint(h * abs(np.cos(rad)) + w * abs(np.sin(rad))))
        else:
            bound_w, bound_h = w, h
        rm = cv2.getRotationMatrix2D(center, angle, 1.0)
        if self.auto_bound:
            rm[0, 2] += bound_w / 2.0 - center[0]
            rm[1, 2] += bound_h / 2.0 - center[1]
        results["img"] = cv2.warpAffine(results["img"], rm, (bound_w, bound_h))
        results["img_shape"] = (bound_h, bound_w) + results["img"].shape[2:]
        polys = results.get("gt_bboxes", np.zeros((0, 8), np.float32))
        labels = results.get("gt_labels", np.zeros((0,), np.int64))
        if len(polys):
            pts = polys.reshape(-1, 2) @ rm[:, :2].T + rm[:, 2]
            polys = pts.reshape(-1, 8).astype(np.float32)
            cx = polys[:, 0::2].mean(1)
            cy = polys[:, 1::2].mean(1)
            keep = (cx > 0) & (cx < bound_w) & (cy > 0) & (cy < bound_h)
            results["gt_bboxes"] = polys[keep]
            results["gt_labels"] = labels[keep]
            if keep.sum() == 0:
                return None
        return results
