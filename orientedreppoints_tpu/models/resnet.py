"""ResNet backbone (NHWC, frozen-BN), torchvision-compatible structure.

Reference parity (mmdet/models/backbones/resnet.py):
  * depths 18/34/50/101/152 via BasicBlock / Bottleneck (resnet.py:26-28);
  * style='pytorch': the stride-2 conv is the 3x3 inside the bottleneck;
  * norm_eval=True + frozen running stats -> FrozenBatchNorm here;
  * frozen_stages handled outside the module by masking the optimizer
    (parameters stay in the tree so converters map 1:1);
  * out_indices (0,1,2,3) -> C2..C5 feature maps at strides 4/8/16/32.

The stem and blocks run in a configurable compute dtype (bfloat16 by
default on TPU) with f32 params; FrozenBN folds to a single multiply-add.
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import FrozenBatchNorm

ARCH_SETTINGS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}

_he_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class _ConvBN(nn.Module):
    features: int
    kernel: int
    strides: int = 1
    act: bool = True
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.strides, self.strides),
            padding=[(self.kernel // 2,) * 2] * 2,
            use_bias=False,
            feature_group_count=self.groups,
            dtype=self.dtype,
            kernel_init=_he_init,
            name="conv",
        )(x)
        x = FrozenBatchNorm(self.features, dtype=self.dtype, name="bn")(x)
        if self.act:
            x = nn.relu(x)
        return x


class _StemKernel(nn.Module):
    """Holds the stem conv kernel under the same tree path nn.Conv uses
    (stem/conv/kernel), so checkpoints/converters are layout-identical
    whichever stem formulation runs."""

    @nn.compact
    def __call__(self):
        return self.param("kernel", _he_init, (7, 7, 3, 64), jnp.float32)


class _StemS2D(nn.Module):
    """Space-to-depth rewrite of the 7x7/s2 stem conv (MLPerf-style).

    EXACT math rewrite: pad the 7x7 kernel to 8x8 with a zero row/col,
    split each tap index as di = 2a + p, and the strided conv becomes a
    4x4 stride-1 VALID conv over the 2x2 space-to-depth input (12
    channels).  Stride-2 7x7 convs map poorly onto the MXU (odd taps,
    strided input reads); the rewritten form is a dense stride-1 conv.
    Parameters and outputs are identical to _ConvBN(64, 7, 2) — the
    kernel rearrangement is traced on the (8*8*3*64) weight, which XLA
    hoists out of the step loop.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = _StemKernel(name="conv")()
        b, h, w, c = x.shape
        assert h % 2 == 0 and w % 2 == 0, (h, w)
        k = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        hp, wp = h + 6, w + 6
        z = (
            xp.reshape(b, hp // 2, 2, wp // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, hp // 2, wp // 2, 4 * c)
        )
        k8 = jnp.pad(k, ((0, 1), (0, 1), (0, 0), (0, 0)))
        k4 = (
            k8.reshape(4, 2, 4, 2, c, 64)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 4 * c, 64)
        )
        y = jax.lax.conv_general_dilated(
            z, k4, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[:, : h // 2, : w // 2]
        y = FrozenBatchNorm(64, dtype=self.dtype, name="bn")(y)
        return nn.relu(y)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = _ConvBN(self.features, 3, self.strides, dtype=self.dtype, name="conv1")(x)
        out = _ConvBN(self.features, 3, 1, act=False, dtype=self.dtype, name="conv2")(out)
        if self.downsample:
            identity = _ConvBN(
                self.features, 1, self.strides, act=False, dtype=self.dtype,
                name="downsample",
            )(x)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck base width; output = 4 * features
    strides: int = 1
    downsample: bool = False
    groups: int = 1  # ResNeXt cardinality (resnet.py `groups`)
    base_width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        width = int(self.features * (self.base_width / 64.0)) * self.groups
        out = _ConvBN(width, 1, 1, dtype=self.dtype, name="conv1")(x)
        # pytorch style: stride on the 3x3 (grouped for ResNeXt)
        out = _ConvBN(width, 3, self.strides, groups=self.groups,
                      dtype=self.dtype, name="conv2")(out)
        out = _ConvBN(self.features * 4, 1, 1, act=False, dtype=self.dtype, name="conv3")(out)
        if self.downsample:
            identity = _ConvBN(
                self.features * 4, 1, self.strides, act=False,
                dtype=self.dtype, name="downsample",
            )(x)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """ResNet backbone returning the feature maps at out_indices."""

    depth: int = 50
    out_indices: Sequence[int] = (0, 1, 2, 3)
    groups: int = 1  # >1 => ResNeXt (e.g. groups=32, base_width=4)
    base_width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        block_type, stage_blocks = ARCH_SETTINGS[self.depth]
        block_cls = BasicBlock if block_type == "basic" else Bottleneck

        x = x.astype(self.dtype)
        if os.environ.get("ORP_STEM", "conv") == "s2d":
            x = _StemS2D(dtype=self.dtype, name="stem")(x)
        else:
            x = _ConvBN(64, 7, 2, dtype=self.dtype, name="stem")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        width = 64
        expansion = 1 if block_type == "basic" else 4
        for stage, num_blocks in enumerate(stage_blocks):
            stride = 1 if stage == 0 else 2
            for blk in range(num_blocks):
                blk_stride = stride if blk == 0 else 1
                needs_ds = blk == 0 and (
                    blk_stride != 1 or x.shape[-1] != width * expansion
                )
                kw = (
                    dict(groups=self.groups, base_width=self.base_width)
                    if block_type == "bottleneck"
                    else {}
                )
                x = block_cls(
                    width,
                    strides=blk_stride,
                    downsample=needs_ds,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{blk}",
                    **kw,
                )(x)
            if stage in self.out_indices:
                outs.append(x)
            width *= 2
        return tuple(outs)
