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
):
    """Render one scene. Returns (img uint8 BGR, objects list of dicts
    with keys poly (8,), name, difficult)."""
    specs = specs or SYNTH_CLASS_SPECS
    names = list(specs)
    # background: low-frequency noise ("terrain") + fine grain
    base = rng.rand(size // 32 + 1, size // 32 + 1, 3).astype(np.float32)
    bg = cv2.resize(base, (size, size), interpolation=cv2.INTER_CUBIC)
    img = (40 + 60 * bg + 12 * rng.randn(size, size, 3)).astype(np.float32)
    img = np.clip(img, 0, 255)

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
            if np.hypot(*(np.mean(poly, 0) - q)) < 0.8 * (r + qr):
                ok = False
                break
        if not ok:
            continue
        jitter = (rng.randn(3) * 14).astype(np.float32)
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


def generate_synth_dota(
    outdir: str,
    n_scenes: int,
    size: int = 768,
    n_objects: int = 24,
    seed: int = 0,
    prefix: str = "S",
):
    """Write n_scenes DOTA-format scenes (images/ + labelTxt/) to outdir.

    Returns the list of scene names.
    """
    imgdir = osp.join(outdir, "images")
    labdir = osp.join(outdir, "labelTxt")
    os.makedirs(imgdir, exist_ok=True)
    os.makedirs(labdir, exist_ok=True)
    rng = np.random.RandomState(seed)
    names = []
    for i in range(n_scenes):
        name = f"{prefix}{i:04d}"
        img, objs = render_scene(rng, size=size, n_objects=n_objects)
        cv2.imwrite(osp.join(imgdir, name + ".png"), img)
        util.write_dota_poly(osp.join(labdir, name + ".txt"), objs)
        names.append(name)
    return names
