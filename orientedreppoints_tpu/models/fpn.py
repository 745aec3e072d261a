"""Feature Pyramid Network (NHWC, GroupNorm).

Reference parity (mmdet/models/necks/fpn.py:11-178 with the oriented config
configs/dota/orientedrepoints_r50_demo.py:16-25):
  * start_level=1: laterals over C3/C4/C5, top-down nearest upsampling;
  * add_extra_convs=True with extra_convs_on_inputs: first extra level is a
    stride-2 conv on the RAW C5 backbone map (fpn.py:115-116, :170-171),
    second extra conv on the previous extra output, no ReLU between
    (relu_before_extra_convs=False);
  * GN(32) on every conv, no activations;
  * output strides 8, 16, 32, 64, 128 (5 levels).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvModule

_xavier_init = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 1
    add_extra_convs: bool = True
    norm: str = "gn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        used = list(inputs[self.start_level:])
        n_lat = len(used)

        laterals = [
            ConvModule(
                self.out_channels, 1, norm=self.norm, act=False,
                dtype=self.dtype, kernel_init=_xavier_init, name=f"lateral_{i}",
            )(used[i])
            for i in range(n_lat)
        ]

        for i in range(n_lat - 1, 0, -1):
            b, h, w, c = laterals[i - 1].shape
            up = jax.image.resize(
                laterals[i], (b, h, w, c), method="nearest"
            )
            laterals[i - 1] = laterals[i - 1] + up

        outs = [
            ConvModule(
                self.out_channels, 3, norm=self.norm, act=False,
                dtype=self.dtype, kernel_init=_xavier_init, name=f"fpn_{i}",
            )(laterals[i])
            for i in range(n_lat)
        ]

        if self.num_outs > n_lat and self.add_extra_convs:
            extra_src = inputs[-1]  # raw C5 (extra_convs_on_inputs)
            for i in range(self.num_outs - n_lat):
                extra_src = ConvModule(
                    self.out_channels, 3, strides=2, norm=self.norm, act=False,
                    dtype=self.dtype, kernel_init=_xavier_init,
                    name=f"fpn_extra_{i}",
                )(extra_src)
                outs.append(extra_src)
        elif self.num_outs > n_lat:
            for _ in range(self.num_outs - n_lat):
                outs.append(
                    nn.max_pool(outs[-1], (1, 1), strides=(2, 2))
                )
        return tuple(outs)
