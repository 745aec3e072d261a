"""Serving Predictor smoke: config -> device-resident weights -> numpy
BGR images in, per-class (k, 9) arrays out, with padding-batch handling."""

import numpy as np
import pytest


class TestPredictor:
    def test_numpy_in_numpy_out(self, tmp_path):
        from orientedreppoints_tpu.serving import Predictor

        pred = Predictor(
            "configs/dota/synth_r18_512.py",
            checkpoint_dir=None,  # random init; tests the API surface
            batch_size=2,
            compute_dtype="float32",
            test_cfg_overrides={
                "nms_pre": 100, "max_per_img": 20, "pre_nms_cap": 128,
                "score_thr": 1e-5,
            },
        )
        rng = np.random.RandomState(0)
        # 3 images through batch_size 2 -> one full + one padded chunk
        imgs = [
            (rng.rand(200 + 30 * i, 260, 3) * 255).astype(np.uint8)
            for i in range(3)
        ]
        out = pred(imgs)
        assert len(out) == 3
        for per_class in out:
            assert len(per_class) == 15
            for arr in per_class:
                assert arr.ndim == 2 and arr.shape[1] == 9
                assert np.all(np.isfinite(arr))
