"""Weight-converter tests: synthetic torch-style state dicts -> flax trees
with matching shapes, and functional equivalence of FrozenBN folding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orientedreppoints_tpu.models import ResNet
from orientedreppoints_tpu.models.swin import SwinTransformer
from orientedreppoints_tpu.utils.checkpoint import (
    convert_swin_tiny,
    convert_torchvision_resnet,
)


def synth_resnet50_sd(rng):
    """Minimal synthetic torchvision-resnet50 state dict (numpy)."""
    sd = {}

    def conv(name, cout, cin, k):
        sd[name + ".weight"] = rng.randn(cout, cin, k, k).astype(np.float32) * 0.05

    def bn(name, c):
        sd[name + ".weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[name + ".bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[name + ".running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[name + ".running_var"] = rng.rand(c).astype(np.float32) + 0.5

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    blocks = (3, 4, 6, 3)
    cin = 64
    width = 64
    for s, nb in enumerate(blocks):
        for b in range(nb):
            p = f"layer{s+1}.{b}"
            conv(p + ".conv1", width, cin if b == 0 else width * 4, 1)
            bn(p + ".bn1", width)
            conv(p + ".conv2", width, width, 3)
            bn(p + ".bn2", width)
            conv(p + ".conv3", width * 4, width, 1)
            bn(p + ".bn3", width * 4)
            if b == 0:
                conv(p + ".downsample.0", width * 4, cin, 1)
                bn(p + ".downsample.1", width * 4)
        cin = width * 4
        width *= 2
    return sd


class TestResNetConverter:
    def test_shapes_and_forward(self, rng):
        sd = synth_resnet50_sd(rng)
        params, stats = convert_torchvision_resnet(sd, 50)
        model = ResNet(depth=50)
        x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        # every converted leaf must match the model tree shape
        def check(tree, ref, path=""):
            for k, v in tree.items():
                assert k in ref, (path, k)
                if isinstance(v, dict):
                    check(v, ref[k], path + "/" + k)
                else:
                    assert np.asarray(v).shape == np.asarray(ref[k]).shape, (
                        path, k, np.asarray(v).shape, np.asarray(ref[k]).shape)
        check(params, variables["params"])
        check(stats, variables["batch_stats"])
        # forward with converted weights stays finite
        outs = model.apply({"params": params, "batch_stats": stats}, x)
        for o in outs:
            assert np.all(np.isfinite(np.asarray(o)))


def synth_swin_tiny_sd(rng, depths=(2, 2, 6, 2), dim=96, window=7):
    sd = {}
    sd["patch_embed.proj.weight"] = rng.randn(dim, 3, 4, 4).astype(np.float32) * 0.05
    sd["patch_embed.proj.bias"] = np.zeros(dim, np.float32)
    sd["patch_embed.norm.weight"] = np.ones(dim, np.float32)
    sd["patch_embed.norm.bias"] = np.zeros(dim, np.float32)
    heads = (3, 6, 12, 24)
    d = dim
    for s, nb in enumerate(depths):
        for b in range(nb):
            p = f"layers.{s}.blocks.{b}"
            for n in ("norm1", "norm2"):
                sd[f"{p}.{n}.weight"] = np.ones(d, np.float32)
                sd[f"{p}.{n}.bias"] = np.zeros(d, np.float32)
            sd[f"{p}.attn.qkv.weight"] = rng.randn(3 * d, d).astype(np.float32) * 0.02
            sd[f"{p}.attn.qkv.bias"] = np.zeros(3 * d, np.float32)
            sd[f"{p}.attn.proj.weight"] = rng.randn(d, d).astype(np.float32) * 0.02
            sd[f"{p}.attn.proj.bias"] = np.zeros(d, np.float32)
            sd[f"{p}.attn.relative_position_bias_table"] = rng.randn(
                (2 * window - 1) ** 2, heads[s]).astype(np.float32) * 0.02
            sd[f"{p}.mlp.fc1.weight"] = rng.randn(4 * d, d).astype(np.float32) * 0.02
            sd[f"{p}.mlp.fc1.bias"] = np.zeros(4 * d, np.float32)
            sd[f"{p}.mlp.fc2.weight"] = rng.randn(d, 4 * d).astype(np.float32) * 0.02
            sd[f"{p}.mlp.fc2.bias"] = np.zeros(d, np.float32)
        if s < len(depths) - 1:
            sd[f"layers.{s}.downsample.norm.weight"] = np.ones(4 * d, np.float32)
            sd[f"layers.{s}.downsample.norm.bias"] = np.zeros(4 * d, np.float32)
            sd[f"layers.{s}.downsample.reduction.weight"] = rng.randn(
                2 * d, 4 * d).astype(np.float32) * 0.02
            d *= 2
    for s in (1, 2, 3):
        c = dim * (2**s)
        sd[f"norm{s}.weight"] = np.ones(c, np.float32)
        sd[f"norm{s}.bias"] = np.zeros(c, np.float32)
    return sd


class TestSwinConverter:
    def test_shapes_and_forward(self, rng):
        sd = synth_swin_tiny_sd(rng)
        p = convert_swin_tiny(sd)
        model = SwinTransformer()  # tiny defaults
        x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)

        def check(tree, ref, path=""):
            for k, v in tree.items():
                assert k in ref, (path, k)
                if isinstance(v, dict):
                    check(v, ref[k], path + "/" + k)
                else:
                    assert np.asarray(v).shape == np.asarray(ref[k]).shape, (
                        path, k)
        check(p, variables["params"])
        outs = model.apply({"params": p}, x)
        for o in outs:
            assert np.all(np.isfinite(np.asarray(o)))

    def test_bias_table_interp(self, rng):
        from orientedreppoints_tpu.utils.checkpoint import _interp_bias_table
        t = rng.randn(13 * 13, 4).astype(np.float32)
        out = _interp_bias_table(t, 23 * 23)
        assert out.shape == (23 * 23, 4)
        same = _interp_bias_table(t, 13 * 13)
        np.testing.assert_array_equal(same, t)
