"""Model forward/decode smoke and shape tests (CPU, small inputs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orientedreppoints_tpu.models import (
    OrientedRepPointsDetector,
    decode_detections,
)


@pytest.fixture(scope="module")
def small_model():
    model = OrientedRepPointsDetector(depth=18, num_classes=16)
    imgs = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs)
    return model, variables


class TestForward:
    def test_output_shapes(self, small_model):
        model, variables = small_model
        imgs = jnp.ones((2, 128, 128, 3), jnp.float32)
        outs = model.apply(variables, imgs)
        assert len(outs["cls_scores"]) == 5
        # strides 8..128 on a 128 input -> 16,8,4,2,1
        expected_hw = [16, 8, 4, 2, 1]
        for lvl in range(5):
            s = outs["cls_scores"][lvl]
            p_i = outs["pts_init"][lvl]
            p_r = outs["pts_refine"][lvl]
            assert s.shape == (2, expected_hw[lvl], expected_hw[lvl], 15)
            assert p_i.shape == (2, expected_hw[lvl], expected_hw[lvl], 18)
            assert p_r.shape == (2, expected_hw[lvl], expected_hw[lvl], 18)
            assert outs["base_feats"][lvl].shape[-1] == 256

    def test_cls_bias_prior(self, small_model):
        model, variables = small_model
        bias = variables["params"]["bbox_head"]["cls_out"]["bias"]
        assert np.allclose(np.asarray(bias), -4.59512, atol=1e-3)

    def test_decode_shapes(self, small_model):
        model, variables = small_model
        imgs = jnp.ones((1, 128, 128, 3), jnp.float32)

        # small pre_nms_cap: the default 4096 makes the unrolled
        # suppression scan a multi-minute CPU compile
        @jax.jit
        def infer(v, x):
            return decode_detections(
                model.apply(v, x), max_per_img=50, nms_pre=100,
                pre_nms_cap=256,
            )

        dets, labels, valid = infer(variables, imgs)
        assert dets.shape == (1, 50, 27)  # 18 reppoints + 8 poly + 1 score
        assert labels.shape == (1, 50)
        assert valid.shape == (1, 50)
        assert np.all(np.isfinite(np.asarray(dets)))

    def test_jit_forward(self, small_model):
        model, variables = small_model
        fwd = jax.jit(lambda v, x: model.apply(v, x))
        imgs = jnp.ones((1, 128, 128, 3), jnp.float32)
        outs = fwd(variables, imgs)
        assert outs["cls_scores"][0].shape == (1, 16, 16, 15)
