"""Swin Transformer backbone (windowed MSA) — NHWC, TPU-native.

Reference parity (mmdet/models/backbones/swin_transformer.py, config
configs/dota/orientedrepoints_swin_tiny_demo.py:9-24): Swin-Tiny,
patch 4, window 7, depths (2,2,6,2), heads (3,6,12,24), mlp_ratio 4,
qkv_bias, APE off, patch_norm on, DropPath 0.2 (linear over depth),
out_indices (1,2,3) with a LayerNorm per emitted stage.

TPU notes: window partition is pure reshape/transpose (XLA-fused); the
per-window attention is one batched MXU matmul over (num_windows*B, 49,
C) tensors; shifted windows use jnp.roll + a precomputed additive mask
(static shapes — image sizes are padded to window multiples at trace time).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_trunc_init = nn.initializers.truncated_normal(stddev=0.02)


def _relative_position_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) index into the (2ws-1)^2 relative bias table."""
    coords = np.stack(
        np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")
    ).reshape(2, -1)  # (2, ws*ws)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def window_partition(x, ws: int):
    """(B, H, W, C) -> (B*nH*nW, ws*ws, C); H, W divisible by ws."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(windows, ws: int, h: int, w: int):
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


def _shift_attn_mask(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """Additive (-100/0) mask (nW, ws*ws, ws*ws) for shifted windows."""
    img = np.zeros((1, hp, wp, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    mw = img.reshape(1, hp // ws, ws, wp // ws, ws, 1)
    mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    mask = mw[:, None, :] - mw[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        """x: (nW*B, N, C); mask: (nW, N, N) additive or None."""
        nwb, n, c = x.shape
        h = self.num_heads
        head_dim = c // h
        scale = head_dim**-0.5
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=_trunc_init, name="qkv")(x)
        qkv = qkv.reshape(nwb, n, 3, h, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]  # (nwb, h, n, hd)
        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        )
        table = self.param(
            "relative_position_bias_table", _trunc_init,
            ((2 * self.window_size - 1) ** 2, h),
        )
        idx = _relative_position_index(self.window_size).reshape(-1)
        bias = table[idx].reshape(n, n, h).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(nwb // nw, nw, h, n, n) + mask[None, :, None]
            attn = attn.reshape(nwb, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum(
            "bhnm,bhmd->bhnd", attn, v, preferred_element_type=jnp.float32
        ).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(nwb, n, c)
        return nn.Dense(c, dtype=self.dtype, kernel_init=_trunc_init,
                        name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, H, W, C)."""
        b, h, w, c = x.shape
        ws = self.window_size
        shortcut = x
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        # pad to window multiples (static)
        hp = int(np.ceil(h / ws)) * ws
        wp = int(np.ceil(w / ws)) * ws
        y = jnp.pad(y, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        # the reference detection Swin shifts UNCONDITIONALLY when
        # shift_size > 0 (swin_transformer.py:223-243) — including the
        # window==resolution case, where the region mask partitions the
        # single window into 9 sub-regions (NOT equivalent to no-shift);
        # verified by the stage-3 feature parity test
        shift = self.shift
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(hp, wp, ws, shift))
        else:
            mask = None
        wins = window_partition(y, ws)
        wins = WindowAttention(
            self.dim, self.num_heads, ws, dtype=self.dtype, name="attn"
        )(wins, mask)
        y = window_reverse(wins, ws, hp, wp)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y[:, :h, :w]
        x = shortcut + self._drop_path(y, deterministic)

        y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                     kernel_init=_trunc_init, name="mlp_fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(c, dtype=self.dtype, kernel_init=_trunc_init,
                     name="mlp_fc2")(y)
        return x + self._drop_path(y, deterministic)

    def _drop_path(self, y, deterministic):
        if deterministic or self.drop_path == 0.0:
            return y
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (y.shape[0], 1, 1, 1))
        return y * mask.astype(y.dtype) / keep


class PatchMerging(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        hp, wp = x.shape[1], x.shape[2]
        # 2x2 neighborhood concat in the reference order (x0;x1;x2;x3 =
        # (0,0),(1,0),(0,1),(1,1))
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2],
             x[:, 1::2, 1::2]], axis=-1,
        )
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        kernel_init=_trunc_init, name="reduction")(x)


class SwinTransformer(nn.Module):
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2
    out_indices: Sequence[int] = (1, 2, 3)
    patch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = x.astype(self.dtype)
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), dtype=self.dtype,
                    kernel_init=_trunc_init, name="patch_embed")(x)
        if self.patch_norm:
            x = nn.LayerNorm(dtype=jnp.float32, name="patch_norm")(x).astype(
                self.dtype)

        total = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total)
        outs = []
        blk_id = 0
        dim = self.embed_dim
        for stage, depth in enumerate(self.depths):
            for d in range(depth):
                x = SwinBlock(
                    dim, self.num_heads[stage], self.window_size,
                    shift=0 if d % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    drop_path=float(dpr[blk_id]),
                    dtype=self.dtype,
                    name=f"stage{stage}_block{d}",
                )(x, deterministic)
                blk_id += 1
            if stage in self.out_indices:
                y = nn.LayerNorm(
                    dtype=jnp.float32, name=f"out_norm{stage}"
                )(x)
                outs.append(y.astype(self.dtype))
            if stage < len(self.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype,
                                 name=f"merge{stage}")(x)
                dim *= 2
        return tuple(outs)
