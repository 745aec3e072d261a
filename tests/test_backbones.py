"""HRNet / SSD-VGG backbone structure tests (shapes, fusion, L2Norm)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orientedreppoints_tpu.models import HRNet, SSDVGG

TINY_EXTRA = dict(
    stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                num_blocks=(1,), num_channels=(8,)),
    stage2=dict(num_modules=1, num_branches=2, block="BASIC",
                num_blocks=(1, 1), num_channels=(8, 16)),
    stage3=dict(num_modules=2, num_branches=3, block="BASIC",
                num_blocks=(1, 1, 1), num_channels=(8, 16, 32)),
    stage4=dict(num_modules=1, num_branches=4, block="BASIC",
                num_blocks=(1, 1, 1, 1), num_channels=(8, 16, 32, 64)),
)


class TestHRNet:
    def test_tiny_shapes(self, rng):
        m = HRNet(extra=TINY_EXTRA)
        x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(v, x)
        assert len(outs) == 4
        # branch maps at strides 4/8/16/32 with the configured channels
        for o, (s, c) in zip(outs, [(4, 8), (8, 16), (16, 32), (32, 64)]):
            assert o.shape == (2, 64 // s, 64 // s, c), o.shape
        for o in outs:
            assert np.all(np.isfinite(np.asarray(o)))
            # post-fusion ReLU
            assert float(jnp.min(o)) >= 0

    def test_default_w32_channels(self, rng):
        m = HRNet()
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(v, x)
        assert [o.shape[-1] for o in outs] == [32, 64, 128, 256]

    def test_fusion_mixes_branches(self, rng):
        """Zeroing the input must still produce zero, and two different
        inputs must change EVERY output branch (cross-resolution fusion
        propagates information everywhere)."""
        m = HRNet(extra=TINY_EXTRA)
        x1 = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
        x2 = x1.at[0, :4, :4].add(3.0)  # local perturbation
        v = m.init(jax.random.PRNGKey(0), x1)
        o1 = m.apply(v, x1)
        o2 = m.apply(v, x2)
        for a, b in zip(o1, o2):
            assert not np.allclose(np.asarray(a), np.asarray(b))


class TestSSDVGG:
    def test_ssd300_shapes(self, rng):
        m = SSDVGG(input_size=300, depth=16)
        x = jnp.asarray(rng.rand(1, 300, 300, 3).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(v, x)
        # classic SSD300 pyramid (ssd_vgg.py docstring + extra_setting)
        shapes = [(38, 512), (19, 1024), (10, 512), (5, 256), (3, 256),
                  (1, 256)]
        assert len(outs) == len(shapes)
        for o, (s, c) in zip(outs, shapes):
            assert o.shape == (1, s, s, c), (o.shape, s, c)

    def test_ssd512_shapes(self, rng):
        m = SSDVGG(input_size=512, depth=16)
        x = jnp.asarray(rng.rand(1, 512, 512, 3).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(v, x)
        shapes = [(64, 512), (32, 1024), (16, 512), (8, 256), (4, 256),
                  (2, 256), (1, 256)]
        assert len(outs) == len(shapes)
        for o, (s, c) in zip(outs, shapes):
            assert o.shape == (1, s, s, c), (o.shape, s, c)

    def test_l2norm(self, rng):
        """L2Norm: unit L2 over channels times the learned scale (init
        20), computed in f32 (ssd_vgg.py:139-153)."""
        from orientedreppoints_tpu.models.ssd_vgg import L2Norm

        x = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32)) * 5
        m = L2Norm(scale=20.0)
        v = m.init(jax.random.PRNGKey(0), x)
        out = np.asarray(m.apply(v, x))
        norms = np.linalg.norm(out, axis=-1)
        np.testing.assert_allclose(norms, 20.0, rtol=1e-5)


class TestStemS2D:
    """ORP_STEM=s2d (space-to-depth stem rewrite) must be numerically
    equivalent to the plain 7x7/s2 stem conv on identical params."""

    def test_s2d_stem_matches_conv_stem(self, rng, monkeypatch):
        from orientedreppoints_tpu.models.resnet import ResNet

        x = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
        model = ResNet(depth=18, out_indices=(0, 1, 2, 3))
        monkeypatch.setenv("ORP_STEM", "conv")
        variables = model.init(jax.random.PRNGKey(0), x)
        outs_conv = model.apply(variables, x)
        monkeypatch.setenv("ORP_STEM", "s2d")
        outs_s2d = model.apply(variables, x)
        for i, (a, b) in enumerate(zip(outs_conv, outs_s2d)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
                err_msg=f"stage {i}")

    def test_s2d_param_tree_identical(self, rng, monkeypatch):
        from orientedreppoints_tpu.models.resnet import ResNet

        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        model = ResNet(depth=18)
        monkeypatch.setenv("ORP_STEM", "conv")
        v_conv = model.init(jax.random.PRNGKey(0), x)
        monkeypatch.setenv("ORP_STEM", "s2d")
        v_s2d = model.init(jax.random.PRNGKey(0), x)
        assert jax.tree.structure(v_conv) == jax.tree.structure(v_s2d)
        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_leaves_with_path(v_conv),
                jax.tree_util.tree_leaves_with_path(v_s2d)):
            assert ka == kb and a.shape == b.shape and a.dtype == b.dtype
