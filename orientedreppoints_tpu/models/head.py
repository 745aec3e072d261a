"""OrientedRepPoints dense head (forward only; losses live in core/).

Reference parity (mmdet/models/anchor_heads/orientedreppoints_head.py):
  * two 3-conv GN+ReLU towers (cls / reg) (:94-112, _init_layers);
  * init points: conv3x3+relu -> conv1x1 to 2*num_points (dy,dx) offsets
    (:122-127, forward_single :157-160);
  * gradient_mul blend: 0.7 * stop_grad(pts) + 0.3 * pts (config
    gradient_mul=0.3; forward_single :162);
  * DCN over (pts - base_grid) offsets feeds both the cls branch and the
    refine branch (:163-166); refine output adds stop_grad(init) (:168);
  * cls_out bias initialized for focal loss prior 0.01 (:140-141), all conv
    weights normal(std 0.01) (init_weights :134-146);
  * returns per-level (cls_score, pts_init, pts_refine, base_feat) — the raw
    FPN feature is carried for APAA adaptive point-feature sampling (:171).

Layout: NHWC; offsets channel pairs are (dy, dx) per point, matching the
reference layout so offset decoding (core/points.py) is shared.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.deform_conv import dcn_base_offset, deform_conv2d_pyramid_pair
from .layers import ConvModule, conv_kernel_init


def bias_init_with_prob(prior: float) -> float:
    return -math.log((1 - prior) / prior)


class OrientedRepPointsHead(nn.Module):
    num_classes: int = 16  # incl. background; sigmoid cls over 15 fg classes
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
    num_points: int = 9
    gradient_mul: float = 0.3
    dtype: Any = jnp.float32

    @property
    def cls_out_channels(self) -> int:
        return self.num_classes - 1

    @nn.compact
    def __call__(self, feats):
        """feats: tuple of per-level NHWC maps. Returns dict of per-level
        lists: cls_scores, pts_init, pts_refine, base_feats.

        The towers and init-offset branch run per level (shared weights),
        then BOTH DCNs run once over the whole pyramid via
        deform_conv2d_pyramid_pair — per-level gathers leave the TPU copy
        engines underutilized, and the paired form additionally fuses the
        two instances' backward scatters (see ops/deform_conv.py).
        """
        shared = self._build()
        cls_feats, pts_feats, inits, dcn_offsets = [], [], [], []
        base = jnp.asarray(dcn_base_offset(int(np.sqrt(self.num_points))),
                           dtype=self.dtype)
        for x in feats:
            cls_feat = x
            pts_feat = x
            for conv in shared["cls_convs"]:
                cls_feat = conv(cls_feat)
            for conv in shared["reg_convs"]:
                pts_feat = conv(pts_feat)
            pts_out_init = shared["pts_init_out"](
                nn.relu(shared["pts_init_conv"](pts_feat)))
            grad_mul = (1 - self.gradient_mul) * jax.lax.stop_gradient(
                pts_out_init) + self.gradient_mul * pts_out_init
            cls_feats.append(cls_feat)
            pts_feats.append(pts_feat)
            inits.append(pts_out_init)
            dcn_offsets.append(grad_mul - base.astype(grad_mul.dtype))

        # paired form: both DCNs share sampling offsets, so the backward
        # combines their per-corner feature-table scatters into (N, 2C)
        # rows (~18 ms/step at 1024^2 B2; ops/deform_conv.py s10 notes)
        cls_dcns, refine_dcns = deform_conv2d_pyramid_pair(
            cls_feats, pts_feats, dcn_offsets,
            shared["cls_dcn_weight"], shared["refine_dcn_weight"])

        outs = {"cls_scores": [], "pts_init": [], "pts_refine": [],
                "base_feats": []}
        for x, init_out, cls_dcn, refine_dcn in zip(
                feats, inits, cls_dcns, refine_dcns):
            cls_out = shared["cls_out"](nn.relu(cls_dcn))
            pts_out_refine = shared["pts_refine_out"](nn.relu(refine_dcn))
            pts_out_refine = pts_out_refine + jax.lax.stop_gradient(init_out)
            outs["cls_scores"].append(cls_out)
            outs["pts_init"].append(init_out)
            outs["pts_refine"].append(pts_out_refine)
            outs["base_feats"].append(x)
        return outs

    def _build(self):
        pts_dim = 2 * self.num_points
        mods = {}
        mods["cls_convs"] = [
            ConvModule(self.feat_channels, 3, norm="gn", dtype=self.dtype,
                       name=f"cls_conv_{i}")
            for i in range(self.stacked_convs)
        ]
        mods["reg_convs"] = [
            ConvModule(self.feat_channels, 3, norm="gn", dtype=self.dtype,
                       name=f"reg_conv_{i}")
            for i in range(self.stacked_convs)
        ]
        mods["pts_init_conv"] = nn.Conv(
            self.point_feat_channels, (3, 3), padding=1, dtype=self.dtype,
            kernel_init=conv_kernel_init, name="pts_init_conv")
        mods["pts_init_out"] = nn.Conv(
            pts_dim, (1, 1), dtype=self.dtype, kernel_init=conv_kernel_init,
            name="pts_init_out")
        # DCN kernels stored (K, Cin, Cout)
        mods["cls_dcn_weight"] = self.param(
            "cls_dcn_weight", nn.initializers.normal(0.01),
            (self.num_points, self.feat_channels, self.point_feat_channels))
        mods["refine_dcn_weight"] = self.param(
            "refine_dcn_weight", nn.initializers.normal(0.01),
            (self.num_points, self.feat_channels, self.point_feat_channels))
        mods["cls_out"] = nn.Conv(
            self.cls_out_channels, (1, 1), dtype=self.dtype,
            kernel_init=conv_kernel_init,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="cls_out")
        mods["pts_refine_out"] = nn.Conv(
            pts_dim, (1, 1), dtype=self.dtype, kernel_init=conv_kernel_init,
            name="pts_refine_out")
        return mods

