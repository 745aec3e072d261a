"""Synthetic DOTA-style scene generator for closed-loop quality benchmarks.

Real DOTA imagery is not available in this environment, so detection
quality (mAP / mAOE) is measured on procedurally rendered aerial-like
scenes: oriented colored rectangles with per-class size/aspect/color
signatures on textured background, annotated in the exact DOTA labelTxt
format. The scenes flow through the SAME production pipeline the reference
uses for real DOTA (DOTA_devkit ImgSplit -> COCO-poly json -> train ->
test -> ResultMerge -> Task1 eval; reference workflow SURVEY.md §3.3), so
the measured mAP exercises every stage end to end.

Classes are separable (color + shape), so a correctly wired detector must
approach mAP ~1.0; training bugs, assignment bugs, decode/NMS bugs, or
merge bugs all show up as a depressed number.
"""

from __future__ import annotations

import os
import os.path as osp

import cv2
import numpy as np

from ..devkit import dota_utils as util

# name -> (BGR color, (min_long, max_long), (min_aspect, max_aspect))
# aspect = long/short edge. Colors well separated; sizes span FPN levels.
SYNTH_CLASS_SPECS = {
    "plane": ((60, 60, 230), (44, 64), (1.0, 1.3)),
    "bridge": ((160, 160, 160), (90, 150), (5.0, 8.0)),
    "small-vehicle": ((230, 120, 40), (16, 26), (1.8, 2.4)),
    "large-vehicle": ((40, 200, 230), (34, 52), (2.2, 3.0)),
    "ship": ((230, 220, 80), (44, 76), (2.8, 3.6)),
    "storage-tank": ((240, 240, 240), (26, 42), (1.0, 1.15)),
}

# Hard benchmark: all 15 DOTA-1.0 classes with deliberately COLLIDING
# color families (separation requires shape/size), denser packing, tiny
# objects, unlabeled distractor clutter, and heavier sensor noise — so the
# measured mAP stays off the 1.0 ceiling and can be trended across rounds.
SYNTH_HARD_CLASS_SPECS = {
    "plane": ((60, 60, 230), (34, 54), (1.0, 1.4)),
    "baseball-diamond": ((50, 140, 90), (40, 60), (1.0, 1.25)),
    "bridge": ((150, 150, 150), (70, 140), (4.5, 8.0)),
    "ground-track-field": ((60, 170, 80), (90, 130), (1.5, 2.0)),
    "small-vehicle": ((200, 120, 60), (10, 20), (1.7, 2.4)),
    "large-vehicle": ((210, 130, 50), (26, 44), (2.2, 3.2)),
    "ship": ((200, 200, 90), (30, 64), (2.6, 3.8)),
    "tennis-court": ((90, 60, 160), (36, 50), (1.8, 2.2)),
    "basketball-court": ((100, 70, 150), (44, 62), (1.5, 1.9)),
    "storage-tank": ((235, 235, 235), (18, 36), (1.0, 1.15)),
    "soccer-ball-field": ((55, 160, 95), (60, 90), (1.3, 1.7)),
    "roundabout": ((225, 225, 225), (36, 56), (1.0, 1.1)),
    "harbor": ((120, 100, 80), (50, 100), (3.5, 5.5)),
    "swimming-pool": ((190, 150, 60), (22, 40), (1.4, 2.0)),
    "helicopter": ((70, 70, 210), (24, 40), (1.5, 2.1)),
}


def _rot_rect_poly(cx, cy, w, h, angle):
    c, s = np.cos(angle), np.sin(angle)
    corners = np.array(
        [[-w / 2, -h / 2], [w / 2, -h / 2], [w / 2, h / 2], [-w / 2, h / 2]]
    )
    return corners @ np.array([[c, s], [-s, c]]) + [cx, cy]


def render_scene(
    rng: np.random.RandomState,
    size: int = 768,
    n_objects: int = 24,
    specs: dict = None,
    margin: int = 24,
    color_jitter: float = 14.0,
    noise: float = 12.0,
    pack: float = 0.8,
    n_distractors: int = 0,
    brightness_gradient: bool = False,
):
    """Render one scene. Returns (img uint8 BGR, objects list of dicts
    with keys poly (8,), name, difficult).

    pack: overlap-rejection factor (lower = denser scenes);
    n_distractors: unlabeled clutter shapes (ellipses/triangles/lines) in
    colors drawn from the CLASS palette — hard negatives for the cls head;
    brightness_gradient: global illumination ramp across the scene.
    """
    specs = specs or SYNTH_CLASS_SPECS
    names = list(specs)
    # background: low-frequency noise ("terrain") + fine grain
    base = rng.rand(size // 32 + 1, size // 32 + 1, 3).astype(np.float32)
    bg = cv2.resize(base, (size, size), interpolation=cv2.INTER_CUBIC)
    img = (40 + 60 * bg + noise * rng.randn(size, size, 3)).astype(
        np.float32)
    if brightness_gradient:
        ang = rng.rand() * 2 * np.pi
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
        ramp = (np.cos(ang) * xx + np.sin(ang) * yy)
        img = img * (0.75 + 0.5 * ramp)[..., None]
    img = np.clip(img, 0, 255)

    # unlabeled distractor clutter FIRST so real objects can overdraw it
    for _ in range(n_distractors):
        col_name = names[rng.randint(len(names))]
        base_col = np.asarray(specs[col_name][0], np.float32)
        col = tuple(
            float(np.clip(c + rng.randn() * 25, 0, 255)) for c in base_col
        )
        cx = rng.rand() * size
        cy = rng.rand() * size
        kind = rng.randint(3)
        if kind == 0:  # ellipse
            ax = int(rng.rand() * 20 + 6)
            cv2.ellipse(img, (int(cx), int(cy)),
                        (ax, int(ax * (0.4 + rng.rand() * 0.5))),
                        rng.rand() * 180, 0, 360, col, -1)
        elif kind == 1:  # triangle
            pts = (np.stack([[cx, cy]] * 3)
                   + rng.randn(3, 2) * 14).astype(np.int32)
            cv2.fillPoly(img, [pts], col)
        else:  # thin line segment (road-like / bridge confuser)
            d = rng.randn(2)
            d = d / (np.hypot(*d) + 1e-6) * (rng.rand() * 60 + 20)
            cv2.line(img, (int(cx - d[0]), int(cy - d[1])),
                     (int(cx + d[0]), int(cy + d[1])), col,
                     int(rng.rand() * 3 + 1))

    objects = []
    placed_polys = []
    tries = 0
    while len(objects) < n_objects and tries < n_objects * 30:
        tries += 1
        name = names[rng.randint(len(names))]
        color, (lmin, lmax), (amin, amax) = specs[name]
        long_e = rng.rand() * (lmax - lmin) + lmin
        aspect = rng.rand() * (amax - amin) + amin
        short_e = long_e / aspect
        angle = rng.rand() * np.pi
        cx = rng.rand() * (size - 2 * margin) + margin
        cy = rng.rand() * (size - 2 * margin) + margin
        poly = _rot_rect_poly(cx, cy, long_e, short_e, angle)
        if poly.min() < 2 or poly.max() > size - 2:
            continue
        # reject heavy center overlap with an already-placed object
        r = long_e / 2 + 6
        ok = True
        for q, qr in placed_polys:
            if np.hypot(*(np.mean(poly, 0) - q)) < pack * (r + qr):
                ok = False
                break
        if not ok:
            continue
        jitter = (rng.randn(3) * color_jitter).astype(np.float32)
        col = tuple(float(np.clip(c + j, 0, 255)) for c, j in zip(color, jitter))
        ipoly = np.round(poly).astype(np.int32)
        cv2.fillPoly(img, [ipoly], col)
        # darker outline so the boundary is crisp at every angle
        cv2.polylines(img, [ipoly], True,
                      tuple(c * 0.5 for c in col), 1)
        placed_polys.append((np.mean(poly, 0), r))
        objects.append(
            dict(poly=poly.reshape(-1).astype(np.float64), name=name,
                 difficult="0")
        )
    return img.astype(np.uint8), objects


HARD_RENDER_KWARGS = dict(
    specs=SYNTH_HARD_CLASS_SPECS,
    color_jitter=24.0,
    noise=20.0,
    pack=0.55,
    n_distractors=40,
    brightness_gradient=True,
)


def generate_synth_dota(
    outdir: str,
    n_scenes: int,
    size: int = 768,
    n_objects: int = 24,
    seed: int = 0,
    prefix: str = "S",
    hard: bool = False,
):
    """Write n_scenes DOTA-format scenes (images/ + labelTxt/) to outdir.

    hard=True renders the 15-class confusable benchmark
    (SYNTH_HARD_CLASS_SPECS + clutter) instead of the easy 6-class one.
    Returns the list of scene names.
    """
    imgdir = osp.join(outdir, "images")
    labdir = osp.join(outdir, "labelTxt")
    os.makedirs(imgdir, exist_ok=True)
    os.makedirs(labdir, exist_ok=True)
    rng = np.random.RandomState(seed)
    kwargs = HARD_RENDER_KWARGS if hard else {}
    names = []
    for i in range(n_scenes):
        name = f"{prefix}{i:04d}"
        img, objs = render_scene(rng, size=size, n_objects=n_objects,
                                 **kwargs)
        cv2.imwrite(osp.join(imgdir, name + ".png"), img)
        util.write_dota_poly(osp.join(labdir, name + ".txt"), objs)
        names.append(name)
    return names
