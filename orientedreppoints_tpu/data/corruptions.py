"""Image corruption suite for the robustness benchmark.

Reference analogue: tools/test_robustness.py + the `imagecorruptions`
package.  A dependency-free numpy/cv2 subset covering the main corruption
families (noise, blur, weather-ish, digital), each with severity 1..5.
Inputs/outputs are uint8 BGR images.
"""

from __future__ import annotations

import cv2
import numpy as np


def _sev(severity, values):
    return values[int(np.clip(severity, 1, 5)) - 1]


def gaussian_noise(img, severity=1, rng=None):
    rng = rng or np.random
    c = _sev(severity, [0.04, 0.06, 0.08, 0.09, 0.10]) * 255
    out = img.astype(np.float32) + rng.normal(0, c, img.shape)
    return np.clip(out, 0, 255).astype(np.uint8)


def shot_noise(img, severity=1, rng=None):
    rng = rng or np.random
    c = _sev(severity, [500, 250, 100, 75, 50])
    out = rng.poisson(img.astype(np.float64) / 255.0 * c) / c * 255
    return np.clip(out, 0, 255).astype(np.uint8)


def impulse_noise(img, severity=1, rng=None):
    rng = rng or np.random
    c = _sev(severity, [0.01, 0.02, 0.03, 0.05, 0.07])
    out = img.copy()
    mask = rng.rand(*img.shape[:2]) < c
    salt = rng.rand(*img.shape[:2]) < 0.5
    out[mask & salt] = 255
    out[mask & ~salt] = 0
    return out


def defocus_blur(img, severity=1, rng=None):
    c = _sev(severity, [3, 4, 6, 8, 10])
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (c, c)).astype(np.float32)
    k /= k.sum()
    return cv2.filter2D(img, -1, k)


def motion_blur(img, severity=1, rng=None):
    c = _sev(severity, [5, 7, 9, 13, 17])
    k = np.zeros((c, c), np.float32)
    k[c // 2] = 1.0 / c
    ang = (rng or np.random).uniform(-45, 45)
    m = cv2.getRotationMatrix2D((c / 2 - 0.5, c / 2 - 0.5), ang, 1)
    k = cv2.warpAffine(k, m, (c, c))
    k /= max(k.sum(), 1e-6)
    return cv2.filter2D(img, -1, k)


def brightness(img, severity=1, rng=None):
    c = _sev(severity, [0.1, 0.2, 0.3, 0.4, 0.5]) * 255
    return np.clip(img.astype(np.float32) + c, 0, 255).astype(np.uint8)


def contrast(img, severity=1, rng=None):
    c = _sev(severity, [0.75, 0.5, 0.4, 0.3, 0.15])
    mean = img.mean(axis=(0, 1), keepdims=True)
    return np.clip((img - mean) * c + mean, 0, 255).astype(np.uint8)


def jpeg_compression(img, severity=1, rng=None):
    c = _sev(severity, [80, 65, 58, 50, 40])
    _, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, int(c)])
    return cv2.imdecode(enc, cv2.IMREAD_COLOR)


def pixelate(img, severity=1, rng=None):
    c = _sev(severity, [0.9, 0.8, 0.7, 0.6, 0.5])
    h, w = img.shape[:2]
    small = cv2.resize(img, (max(int(w * c), 1), max(int(h * c), 1)),
                       interpolation=cv2.INTER_AREA)
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)


CORRUPTIONS = {
    "gaussian_noise": gaussian_noise,
    "shot_noise": shot_noise,
    "impulse_noise": impulse_noise,
    "defocus_blur": defocus_blur,
    "motion_blur": motion_blur,
    "brightness": brightness,
    "contrast": contrast,
    "jpeg_compression": jpeg_compression,
    "pixelate": pixelate,
}


def corrupt(img, corruption: str, severity: int = 1, rng=None):
    return CORRUPTIONS[corruption](img, severity, rng)
