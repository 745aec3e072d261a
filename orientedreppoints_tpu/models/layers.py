"""Shared building blocks: ConvModule (conv+norm+act) and frozen BatchNorm.

Reference parity:
  * ConvModule — conv + GN/BN + ReLU block (mmdet/ops/conv_module.py); the
    oriented head and FPN use GN(32) (configs/dota/orientedrepoints_r50_demo.py:2).
  * FrozenBatchNorm — the reference trains the ResNet with norm_eval=True and
    frozen running stats (resnet.py `norm_eval`, config `:13`), i.e. BN is a
    fixed affine transform; we model it exactly that way (stats become
    non-trainable constants loaded from pretrained checkpoints).

All modules are NHWC (TPU-native layout).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

conv_kernel_init = nn.initializers.normal(stddev=0.01)


class FrozenBatchNorm(nn.Module):
    """BatchNorm with frozen statistics and affine parameters as variables.

    Stats/affine live in the 'batch_stats'/'params' collections so they can
    be overwritten by the torchvision weight converter; they are never
    updated by training (norm_eval semantics).
    """

    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,))
        ).value
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,))
        ).value
        # fold into a single multiply-add in the compute dtype (coefficients
        # derived in f32): avoids a bf16->f32->bf16 round trip per layer,
        # which doubles HBM traffic on the big early-stage maps
        inv = (scale / jnp.sqrt(var + self.eps)).astype(self.dtype)
        shift = (bias - mean * scale / jnp.sqrt(var + self.eps)).astype(
            self.dtype
        )
        return x.astype(self.dtype) * inv + shift


class ConvModule(nn.Module):
    """conv (no bias when normed) + optional GN/frozen-BN + optional ReLU."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    norm: Optional[str] = "gn"  # 'gn' | 'bn_frozen' | None
    act: bool = True
    gn_groups: int = 32
    dtype: Any = jnp.float32
    kernel_init: Callable = conv_kernel_init

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=[(self.kernel_size // 2,) * 2] * 2,
            use_bias=self.norm is None,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
            name="conv",
        )(x)
        if self.norm == "gn":
            # flax GroupNorm reduces in f32 internally; emitting in the
            # compute dtype avoids an extra cast pass over the map
            x = nn.GroupNorm(
                num_groups=self.gn_groups, dtype=self.dtype, name="gn"
            )(x)
        elif self.norm == "bn_frozen":
            x = FrozenBatchNorm(self.features, dtype=self.dtype, name="bn")(x)
        if self.act:
            x = nn.relu(x)
        return x
