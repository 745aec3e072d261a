"""Synthetic-scene generator tests (easy + hard benchmark variants).

The generator backs the closed-loop quality benchmarks
(tools/synth_benchmark.py); these tests pin the label contract: polys in
DOTA labelTxt order, class names from the spec in use, deterministic
under a fixed seed, and hard-mode clutter never leaks into labels.
"""

import os.path as osp

import numpy as np

from orientedreppoints_tpu.data.synth import (
    HARD_RENDER_KWARGS, SYNTH_CLASS_SPECS, SYNTH_HARD_CLASS_SPECS,
    generate_synth_dota, render_scene,
)
from orientedreppoints_tpu.devkit.dota_utils import DOTA10_CLASSES


class TestRenderScene:
    def test_easy_defaults(self, rng):
        img, objs = render_scene(rng, size=512, n_objects=16)
        assert img.shape == (512, 512, 3) and img.dtype == np.uint8
        assert len(objs) >= 12  # placement rejection can drop a few
        for o in objs:
            assert o["name"] in SYNTH_CLASS_SPECS
            poly = o["poly"].reshape(4, 2)
            assert poly.min() >= 0 and poly.max() <= 512
            # rectangle: diagonals equal and bisect each other
            np.testing.assert_allclose(
                poly[0] + poly[2], poly[1] + poly[3], atol=1e-6)

    def test_hard_variant(self, rng):
        img, objs = render_scene(rng, size=768, n_objects=40,
                                 **HARD_RENDER_KWARGS)
        assert len(objs) >= 30  # dense packing still places most
        names = {o["name"] for o in objs}
        assert names <= set(SYNTH_HARD_CLASS_SPECS)
        assert len(names) >= 8  # draws broadly across the 15 classes
        # every hard class is a DOTA-1.0 name (Task1 writer compatibility)
        assert set(SYNTH_HARD_CLASS_SPECS) == set(DOTA10_CLASSES)

    def test_deterministic(self):
        a = render_scene(np.random.RandomState(3), size=256, n_objects=8)
        b = render_scene(np.random.RandomState(3), size=256, n_objects=8)
        np.testing.assert_array_equal(a[0], b[0])
        assert len(a[1]) == len(b[1])
        for oa, ob in zip(a[1], b[1]):
            assert oa["name"] == ob["name"]
            np.testing.assert_allclose(oa["poly"], ob["poly"])


class TestGenerateSynthDota:
    def test_writes_dota_format(self, tmp_path):
        names = generate_synth_dota(str(tmp_path), 2, size=256,
                                    n_objects=6, hard=True)
        assert names == ["S0000", "S0001"]
        for n in names:
            assert osp.exists(tmp_path / "images" / f"{n}.png")
            lines = (tmp_path / "labelTxt" / f"{n}.txt").read_text() \
                .splitlines()
            assert lines
            for ln in lines:
                parts = ln.split()
                assert len(parts) == 10
                assert parts[8] in SYNTH_HARD_CLASS_SPECS
                np.array(parts[:8], np.float64)  # parseable coords
