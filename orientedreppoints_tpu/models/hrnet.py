"""HRNet backbone (NHWC flax), config-compatible with the reference.

Reference parity (mmdet/models/backbones/hrnet.py):
  * `extra` dict schema: stage1..stage4, each with num_modules /
    num_branches / block ('BASIC'|'BOTTLENECK') / num_blocks /
    num_channels (hrnet.py:256-342);
  * stem: two stride-2 3x3 convs to 64ch (hrnet.py:276-296), stage1 is a
    plain residual layer (hrnet.py:298-306);
  * transitions between stages: 3x3 conv when channels change, stride-2
    3x3 chains for new branches (hrnet.py:352-396); new branches grow
    from the LAST previous feature (forward, hrnet.py:493-513);
  * HRModule fusion: j>i -> 1x1 conv + norm + nearest x2^(j-i) upsample;
    j<i -> (i-j) stride-2 3x3 convs (ReLU between, none on the last);
    summed then ReLU (hrnet.py:113-191);
  * norm_eval=True semantics -> FrozenBatchNorm (same convention as the
    ResNet port, models/resnet.py).

Outputs the 4 branch maps at strides 4/8/16/32 (multiscale_output), which
feed FPN like the C2..C5 ResNet maps.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .resnet import BasicBlock, Bottleneck, _ConvBN

# HRNetV2p-W32, the standard detection config (mmdet configs/hrnet)
HRNET_W32_EXTRA = dict(
    stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                num_blocks=(4,), num_channels=(64,)),
    stage2=dict(num_modules=1, num_branches=2, block="BASIC",
                num_blocks=(4, 4), num_channels=(32, 64)),
    stage3=dict(num_modules=4, num_branches=3, block="BASIC",
                num_blocks=(4, 4, 4), num_channels=(32, 64, 128)),
    stage4=dict(num_modules=3, num_branches=4, block="BASIC",
                num_blocks=(4, 4, 4, 4), num_channels=(32, 64, 128, 256)),
)

_EXPANSION = {"BASIC": 1, "BOTTLENECK": 4}


def _nearest_up(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Nearest-neighbour upsample by an integer factor (NHWC)."""
    x = jnp.repeat(x, factor, axis=1)
    return jnp.repeat(x, factor, axis=2)


class _Branch(nn.Module):
    """num_blocks residual blocks at a fixed width."""

    block: str
    width: int
    num_blocks: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cls = BasicBlock if self.block == "BASIC" else Bottleneck
        out_ch = self.width * _EXPANSION[self.block]
        for b in range(self.num_blocks):
            x = cls(
                self.width,
                strides=1,
                downsample=(b == 0 and x.shape[-1] != out_ch),
                dtype=self.dtype,
                name=f"block{b}",
            )(x)
        return x


class HRModule(nn.Module):
    """Parallel branches + full cross-resolution fusion."""

    block: str
    num_branches: int
    num_blocks: Sequence[int]
    channels: Sequence[int]  # post-expansion channels per branch
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs):
        exp = _EXPANSION[self.block]
        xs = [
            _Branch(self.block, self.channels[i] // exp, self.num_blocks[i],
                    dtype=self.dtype, name=f"branch{i}")(x)
            for i, x in enumerate(xs)
        ]
        if self.num_branches == 1:
            return xs

        fused = []
        for i in range(self.num_branches):
            y = xs[i]
            for j in range(self.num_branches):
                if j == i:
                    continue
                if j > i:
                    # low-res -> i: 1x1 conv+norm, nearest upsample
                    z = _ConvBN(self.channels[i], 1, 1, act=False,
                                dtype=self.dtype, name=f"fuse{i}_{j}")(xs[j])
                    z = _nearest_up(z, 2 ** (j - i))
                else:
                    # high-res -> i: chain of stride-2 3x3 convs
                    z = xs[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        z = _ConvBN(
                            self.channels[i] if last else self.channels[j],
                            3, 2, act=not last, dtype=self.dtype,
                            name=f"fuse{i}_{j}_{k}",
                        )(z)
                y = y + z
            fused.append(nn.relu(y))
        return fused


class HRNet(nn.Module):
    """HRNet backbone; returns the branch maps at strides 4/8/16/32."""

    extra: Mapping[str, Mapping] | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        extra = dict(self.extra or HRNET_W32_EXTRA)
        x = x.astype(self.dtype)
        x = _ConvBN(64, 3, 2, dtype=self.dtype, name="stem1")(x)
        x = _ConvBN(64, 3, 2, dtype=self.dtype, name="stem2")(x)

        # stage 1: plain residual layer
        s1 = extra["stage1"]
        x = _Branch(s1["block"], s1["num_channels"][0], s1["num_blocks"][0],
                    dtype=self.dtype, name="layer1")(x)
        feats = [x]
        prev_channels = [s1["num_channels"][0] * _EXPANSION[s1["block"]]]

        for si in (2, 3, 4):
            cfg = extra[f"stage{si}"]
            exp = _EXPANSION[cfg["block"]]
            cur_channels = [c * exp for c in cfg["num_channels"]]
            # transition: adapt existing branches, grow new ones from the
            # last previous feature (hrnet.py:493-513)
            ins = []
            for i in range(cfg["num_branches"]):
                if i < len(prev_channels):
                    if cur_channels[i] != prev_channels[i]:
                        # INTENTIONAL deviation: the reference forward
                        # feeds every non-None transition from y_list[-1]
                        # (hrnet.py:500-513) even for an existing branch,
                        # but its transition conv was built for branch-i
                        # channels (_make_transition_layer), so any config
                        # reaching that path crashes upstream on a channel
                        # mismatch.  Standard W18/W32/W48 configs never
                        # build one (widths match -> None).  We feed
                        # branch i so custom-width configs actually work;
                        # see docs/PARITY.md (HRNet note).
                        ins.append(_ConvBN(
                            cur_channels[i], 3, 1, dtype=self.dtype,
                            name=f"transition{si}_{i}")(feats[i]))
                    else:
                        ins.append(feats[i])
                else:
                    z = feats[-1]
                    for j in range(i + 1 - len(prev_channels)):
                        out_ch = (cur_channels[i]
                                  if j == i - len(prev_channels)
                                  else prev_channels[-1])
                        z = _ConvBN(out_ch, 3, 2, dtype=self.dtype,
                                    name=f"transition{si}_{i}_{j}")(z)
                    ins.append(z)
            for m in range(cfg["num_modules"]):
                ins = HRModule(
                    cfg["block"], cfg["num_branches"], cfg["num_blocks"],
                    cur_channels, dtype=self.dtype,
                    name=f"stage{si}_{m}",
                )(ins)
            feats = ins
            prev_channels = cur_channels
        return tuple(feats)
