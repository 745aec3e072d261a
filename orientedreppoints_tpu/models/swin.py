"""Swin Transformer backbone (windowed MSA) — NHWC, TPU-native.

Reference parity target (mmdet/models/backbones/swin_transformer.py:450-630,
config configs/dota/orientedrepoints_swin_tiny_demo.py:9-24): Swin-Tiny,
window 7, depths (2,2,6,2), heads (3,6,12,24), APE off, DropPath 0.2,
out_indices (1,2,3) plus C2 for FPN input compatibility.

NOTE: full implementation lands in a later milestone this round; the module
is declared so detector wiring and converters can reference it.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


class SwinTransformer(nn.Module):
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    out_indices: Sequence[int] = (0, 1, 2, 3)
    drop_path_rate: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        raise NotImplementedError(
            "SwinTransformer lands in the Swin milestone of this round; "
            "use backbone_type='resnet' until then."
        )
