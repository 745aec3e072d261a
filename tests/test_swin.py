"""Swin backbone tests: shapes, shifted-window masking, detector wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orientedreppoints_tpu.models import OrientedRepPointsDetector
from orientedreppoints_tpu.models.swin import (
    SwinTransformer,
    _relative_position_index,
    _shift_attn_mask,
    window_partition,
    window_reverse,
)


class TestHelpers:
    def test_window_roundtrip(self, rng):
        x = jnp.asarray(rng.rand(2, 14, 28, 8).astype(np.float32))
        w = window_partition(x, 7)
        assert w.shape == (2 * 2 * 4, 49, 8)
        back = window_reverse(w, 7, 14, 28)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x))

    def test_relative_index_symmetry(self):
        idx = _relative_position_index(7)
        assert idx.shape == (49, 49)
        assert idx.max() == 13 * 13 - 1
        assert (np.diag(idx) == idx[0, 0]).all()  # same relative offset (0,0)

    def test_shift_mask_blocks(self):
        m = _shift_attn_mask(14, 14, 7, 3)
        assert m.shape == (4, 49, 49)
        # top-left window: no wrapping -> fully visible
        assert (m[0] == 0).all()
        # bottom-right window mixes 4 regions -> some masked pairs
        assert (m[-1] == -100).any()


class TestSwin:
    def test_tiny_shapes(self, rng):
        model = SwinTransformer(embed_dim=32, depths=(1, 1, 1, 1),
                                num_heads=(1, 2, 4, 8), window_size=7)
        x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        outs = model.apply(variables, x)
        # out_indices (1,2,3): strides 8,16,32 with dims 2C,4C,8C
        assert len(outs) == 3
        assert outs[0].shape == (1, 8, 8, 64)
        assert outs[1].shape == (1, 4, 4, 128)
        assert outs[2].shape == (1, 2, 2, 256)

    def test_nondivisible_input(self, rng):
        model = SwinTransformer(embed_dim=32, depths=(1, 1), num_heads=(1, 2),
                                window_size=7, out_indices=(0, 1))
        # 100/4 = 25, not divisible by 7 -> internal padding path
        x = jnp.asarray(rng.rand(1, 100, 100, 3).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        outs = model.apply(variables, x)
        assert outs[0].shape == (1, 25, 25, 32)
        assert np.all(np.isfinite(np.asarray(outs[0])))

    def test_detector_with_swin(self, rng):
        model = OrientedRepPointsDetector(
            backbone_type="swin", num_classes=16,
            backbone_kwargs=dict(embed_dim=32, depths=(1, 1, 1, 1),
                                 num_heads=(1, 2, 4, 8)),
        )
        x = jnp.asarray(rng.rand(1, 224, 224, 3).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        outs = model.apply(variables, x)
        assert len(outs["cls_scores"]) == 5
        # strides 8..128 on 224 input
        assert outs["cls_scores"][0].shape == (1, 28, 28, 15)
        assert outs["cls_scores"][4].shape[1] == 2  # 28/16 via maxpool x2

    def test_droppath_stochastic(self, rng):
        model = SwinTransformer(embed_dim=32, depths=(2,), num_heads=(2,),
                                drop_path_rate=0.9, out_indices=(0,))
        x = jnp.asarray(rng.rand(4, 56, 56, 3).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        o1 = model.apply(variables, x, False,
                         rngs={"dropout": jax.random.PRNGKey(1)})
        o2 = model.apply(variables, x, False,
                         rngs={"dropout": jax.random.PRNGKey(2)})
        assert not np.allclose(np.asarray(o1[0]), np.asarray(o2[0]))
