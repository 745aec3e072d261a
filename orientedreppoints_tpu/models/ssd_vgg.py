"""SSD-VGG backbone (NHWC flax), reference-compatible structure.

Reference parity (mmdet/models/backbones/ssd_vgg.py + mmcv.cnn.VGG):
  * VGG depths 11/13/16/19 (mmcv arch table), with_last_pool=False,
    ceil_mode=True pooling;
  * SSD additions: stride-1 3x3 maxpool, dilated-6 3x3 conv to 1024,
    1x1 conv to 1024 (ssd_vgg.py:55-66);
  * taps after relu4_3 (L2Norm-scaled, ssd_vgg.py:106,139-153) and
    after the added conv7;
  * extra feature layers per input size 300/512 with the 'S' stride-2
    markers and alternating 1x1/3x3 kernels (ssd_vgg.py:33-36,112-136),
    one output after every second extra layer.

The torch version indexes taps by flat nn.Sequential position
(out_feature_indices); here taps are structural (after the stage-4 relu
and after conv7) — identical activations for every supported depth.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .resnet import _he_init

VGG_ARCH = {
    11: (1, 1, 2, 2, 2),
    13: (2, 2, 2, 2, 2),
    16: (2, 2, 3, 3, 3),
    19: (2, 2, 4, 4, 4),
}

EXTRA_SETTING = {
    300: (256, "S", 512, 128, "S", 256, 128, 256, 128, 256),
    512: (256, "S", 512, 128, "S", 256, 128, "S", 256, 128, "S", 256, 128),
}


def _ceil_pool(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 max pool with ceil_mode=True (pad bottom/right when
    the spatial dim is odd, like torch's ceil_mode)."""
    pad_h = x.shape[1] % 2
    pad_w = x.shape[2] % 2
    return nn.max_pool(
        x, (2, 2), strides=(2, 2),
        padding=[(0, pad_h), (0, pad_w)],
    )


class L2Norm(nn.Module):
    """Per-channel learned-scale L2 normalization (ssd_vgg.py:139-153);
    computed in f32 like the reference fp16 path."""

    scale: float = 20.0
    eps: float = 1e-10

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight", nn.initializers.constant(self.scale), (x.shape[-1],)
        )
        xf = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True)) + self.eps
        return (w[None, None, None, :] * xf / norm).astype(x.dtype)


class SSDVGG(nn.Module):
    """VGG + SSD extra layers; returns (l2norm(relu4_3), conv7, extras...)."""

    input_size: int = 300
    depth: int = 16
    l2_norm_scale: float = 20.0
    max_outs: int | None = None  # stop building extras past this many maps
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert self.input_size in (300, 512)
        stage_convs = VGG_ARCH[self.depth]
        x = x.astype(self.dtype)
        outs = []

        # VGG stages (64, 128, 256, 512, 512); pool between stages with
        # ceil_mode; no pool after the last stage (with_last_pool=False)
        widths = (64, 128, 256, 512, 512)
        for stage, (width, n) in enumerate(zip(widths, stage_convs)):
            for i in range(n):
                x = nn.Conv(
                    width, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=_he_init, name=f"conv{stage + 1}_{i + 1}",
                )(x)
                x = nn.relu(x)
            if stage == 3:
                outs.append(L2Norm(self.l2_norm_scale, name="l2_norm")(x))
            if stage < 4:
                x = _ceil_pool(x)

        # SSD head: stride-1 3x3 pool, dilated conv6, 1x1 conv7
        x = nn.max_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)])
        x = nn.relu(nn.Conv(
            1024, (3, 3), padding=6, kernel_dilation=(6, 6),
            dtype=self.dtype, kernel_init=_he_init, name="conv6",
        )(x))
        x = nn.relu(nn.Conv(
            1024, (1, 1), dtype=self.dtype, kernel_init=_he_init,
            name="conv7",
        )(x))
        outs.append(x)

        # extra layers: alternating 1x1 / 3x3 kernels; an 'S' entry marks
        # the FOLLOWING conv as stride-2/pad-1 (ssd_vgg.py:112-132); a
        # feature is emitted after every second extra layer (every 3x3)
        setting: Sequence = EXTRA_SETTING[self.input_size]
        num = 0
        stride2 = False
        for e in setting:
            if self.max_outs is not None and len(outs) >= self.max_outs:
                return tuple(outs)
            if e == "S":
                stride2 = True
                continue
            k = (1, 3)[num % 2]
            x = nn.Conv(
                e, (k, k),
                strides=(2, 2) if stride2 else (1, 1),
                padding=1 if stride2 else 0,
                dtype=self.dtype, kernel_init=_he_init,
                name=f"extra{num}",
            )(x)
            x = nn.relu(x)
            stride2 = False
            num += 1
            if num % 2 == 0:
                outs.append(x)
        if self.input_size == 512:
            x = nn.relu(nn.Conv(
                256, (4, 4), padding=1, dtype=self.dtype,
                kernel_init=_he_init, name=f"extra{num}",
            )(x))
            outs.append(x)
        return tuple(outs)
