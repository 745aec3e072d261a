"""Deformable convolution (DCNv1) as bilinear gather + MXU matmul.

Reference: mmdet/ops/dcn/src/deform_conv_cuda_kernel.cu — im2col with
bilinear sampling at (p0 + p_k + Δp_k), then GEMM.  The TPU-native design
keeps the same math but expresses it as:

  1. compute all sample coordinates (static shapes, vectorized),
  2. one batched gather of the 4 bilinear corners from the feature map,
  3. a single einsum over (kernel position, channel) -> MXU matmul.

Offsets follow the reference channel layout: (B, H, W, 2*K) with (dy, dx)
pairs per kernel position k, k row-major over the 3x3 grid
(orientedreppoints_head.py:83-90 dcn_base_offset construction).

Sampling uses zero padding outside the feature map (matching the CUDA
bilinear with border zeroing).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def dcn_base_offset(kernel_size: int = 3) -> np.ndarray:
    """(1, 1, 1, 2*K) base grid offsets in (dy, dx) pairs, k row-major.

    Matches the reference buffer (orientedreppoints_head.py:83-90).
    """
    pad = (kernel_size - 1) // 2
    base = np.arange(-pad, pad + 1, dtype=np.float32)
    base_y = np.repeat(base, kernel_size)
    base_x = np.tile(base, kernel_size)
    return np.stack([base_y, base_x], axis=1).reshape(1, 1, 1, -1)


def _bilinear_gather_4take(feat: jnp.ndarray, py: jnp.ndarray,
                           px: jnp.ndarray):
    """Default formulation: one take per bilinear corner (4 independent
    gathers of N rows each).

    Measured on v5e (tools/bench_dcn_gather.py, round 2): XLA overlaps
    INDEPENDENT gathers almost perfectly — 4 takes of 590k x 512B rows
    finish in ~the time of one (11.7 ms vs 12.6 ms for a single take of
    the same total rows), while a fused single take of 4x-wide (2 KB)
    rows is 2x SLOWER (gather throughput degrades with row width:
    ~30 GB/s @512B -> ~70 GB/s @2KB effective, but the fused variant
    still loses because the 4 narrow takes overlap).  So the packed
    single-gather "optimization" is a measured negative; keep 4 takes.
    """
    b, h, w, c = feat.shape
    out_shape = py.shape[1:]
    py = py.reshape(b, -1)
    px = px.reshape(b, -1)

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = py - y0
    wx = px - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    # flat global take over (B*H*W, C): ~2x faster than the batched
    # take_along_axis lowering on TPU (gathers are row-count bound)
    flat = feat.reshape(b * h * w, c)
    batch_base = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None]

    def corner(yi, xi):
        ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take(flat, (idx + batch_base).reshape(-1), axis=0)
        vals = vals.reshape(b, -1, c)
        return vals * ok[:, :, None].astype(feat.dtype)

    v00 = corner(y0i, x0i)
    v01 = corner(y0i, x0i + 1)
    v10 = corner(y0i + 1, x0i)
    v11 = corner(y0i + 1, x0i + 1)
    wy = wy[..., None].astype(feat.dtype)
    wx = wx[..., None].astype(feat.dtype)
    out = (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )
    return out.reshape((b,) + out_shape + (c,))


def bilinear_gather(feat: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray):
    """Bilinear sample feat at float positions with zero padding.

    feat: (B, H, W, C); py, px: (B, ...) float sample coords (pixel units).
    Returns (B, ..., C).

    Dispatches to the 4-take formulation by default (see
    _bilinear_gather_4take for the v5e measurements).  The fused
    single-take variant below — the 4 corners pre-packed along channels
    via a zero-padded copy plus its x/y/xy-shifted views, one take of N
    4C-wide rows — is kept selectable (ORP_DCN_GATHER=fused) as the
    documented negative result: it quarters gather rows but wide-row
    gather throughput drops enough, and independent narrow takes overlap
    well enough, that it is ~2x slower end-to-end.
    """
    if os.environ.get("ORP_DCN_GATHER", "4take") != "fused":
        return _bilinear_gather_4take(feat, py, px)
    return _bilinear_gather_fused(feat, py, px)


def _bilinear_gather_fused(feat: jnp.ndarray, py: jnp.ndarray,
                           px: jnp.ndarray):
    """Fused single-take variant (measured negative — see bilinear_gather)."""
    b, h, w, c = feat.shape
    out_shape = py.shape[1:]
    py = py.reshape(b, -1)
    px = px.reshape(b, -1)

    y0f = jnp.floor(py)
    x0f = jnp.floor(px)
    wy = (py - y0f)[..., None].astype(feat.dtype)
    wx = (px - x0f)[..., None].astype(feat.dtype)
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)

    # featp: 1-pixel zero border all around -> (B, H+2, W+2, C); index
    # (y+1, x+1) addresses original pixel (y, x), borders read zeros.
    featp = jnp.pad(feat, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # pack the 2x2 corner patch along channels: patch4[i, j] =
    # [featp[i,j], featp[i,j+1], featp[i+1,j], featp[i+1,j+1]],
    # for i in [0, H], j in [0, W] -> (B, H+1, W+1, 4C)
    patch4 = jnp.concatenate(
        [
            featp[:, : h + 1, : w + 1],
            featp[:, : h + 1, 1:],
            featp[:, 1:, : w + 1],
            featp[:, 1:, 1:],
        ],
        axis=-1,
    )
    hp, wp = h + 1, w + 1
    flat = patch4.reshape(b * hp * wp, 4 * c)
    batch_base = (jnp.arange(b, dtype=jnp.int32) * (hp * wp))[:, None]

    # the 2x2 patch at (y0, x0) touches the map iff y0 in [-1, H-1] and
    # x0 in [-1, W-1]; clip into that range (padded index = +1) and mask
    # fully-outside rows.
    inb = (y0 >= -1) & (y0 <= h - 1) & (x0 >= -1) & (x0 <= w - 1)
    gy = jnp.clip(y0, -1, h - 1) + 1
    gx = jnp.clip(x0, -1, w - 1) + 1
    idx = (gy * wp + gx + batch_base).reshape(-1)
    vals = jnp.take(flat, idx, axis=0).reshape(b, -1, 4, c)
    vals = vals * inb[:, :, None, None].astype(feat.dtype)

    v00, v01, v10, v11 = (vals[:, :, i] for i in range(4))
    out = (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )
    return out.reshape((b,) + out_shape + (c,))


def deform_conv2d_pyramid(
    feats: list,
    offsets: list,
    weight: jnp.ndarray,
    kernel_size: int = 3,
) -> list:
    """DCNv1 over a whole feature pyramid with ONE fused gather table.

    feats: per-level (B, H_l, W_l, C) maps (same B and C across levels);
    offsets: per-level (B, H_l, W_l, 2K) deformation offsets (same
    convention as deform_conv2d); weight: (K, C, Cout).
    Returns the per-level (B, H_l, W_l, Cout) outputs.

    Measured motivation (v5e, tools/bench_dcn_gather.py round 2): issuing
    the bilinear gathers per level leaves them poorly overlapped
    (~12 ns/row effective); flattening every level+image into one
    (sum_l B*H_l*W_l, C) table and gathering ALL samples with 4 big
    corner takes reaches the large-N take rate (~5 ns/row) — 78.8 ms ->
    34.6 ms for the two head DCN instances at 1024^2/B4.  Folding the 4
    corners into one take as well makes it slower again (71 ms): the 4
    independent takes overlap almost perfectly while a single take of 4x
    the rows pays full marginal cost.
    """
    k = weight.shape[0]
    c = feats[0].shape[-1]
    b = feats[0].shape[0]
    base = jnp.asarray(dcn_base_offset(kernel_size), jnp.float32)

    flat = jnp.concatenate([f.reshape(-1, c) for f in feats], axis=0)
    idxs = [[], [], [], []]
    oks = [[], [], [], []]
    wys, wxs = [], []
    lvl_base = 0
    for f, o in zip(feats, offsets):
        _, h, w, _ = f.shape
        off = (o.astype(jnp.float32) + base).reshape(b, h, w, k, 2)
        iy = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
        ix = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
        py = (off[..., 0] + iy).reshape(b, -1)
        px = (off[..., 1] + ix).reshape(b, -1)
        y0f = jnp.floor(py)
        x0f = jnp.floor(px)
        wys.append((py - y0f).reshape(-1))
        wxs.append((px - x0f).reshape(-1))
        y0 = y0f.astype(jnp.int32)
        x0 = x0f.astype(jnp.int32)
        row0 = (jnp.arange(b, dtype=jnp.int32) * (h * w) + lvl_base)[:, None]
        ci = 0
        for dy in (0, 1):
            for dx in (0, 1):
                yy = y0 + dy
                xx = x0 + dx
                oks[ci].append(
                    ((yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)).reshape(-1)
                )
                idxs[ci].append(
                    (jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
                     + row0).reshape(-1)
                )
                ci += 1
        lvl_base += b * h * w

    idx = [jnp.concatenate(x) for x in idxs]
    ok = [jnp.concatenate(x) for x in oks]
    wy = jnp.concatenate(wys)[:, None].astype(flat.dtype)
    wx = jnp.concatenate(wxs)[:, None].astype(flat.dtype)

    # 4 independent corner takes over the global table (they overlap)
    v = [
        jnp.take(flat, i, axis=0) * o[:, None].astype(flat.dtype)
        for i, o in zip(idx, ok)
    ]
    samples = (
        v[0] * (1 - wy) * (1 - wx)
        + v[1] * (1 - wy) * wx
        + v[2] * wy * (1 - wx)
        + v[3] * wy * wx
    ).reshape(-1, k, c)  # (sum_l B*H_l*W_l, K, C)

    out = jnp.einsum(
        "nkc,kco->no", samples, weight.astype(samples.dtype),
        preferred_element_type=jnp.float32,
    ).astype(feats[0].dtype)

    outs = []
    start = 0
    cout = weight.shape[-1]
    for f in feats:
        _, h, w, _ = f.shape
        outs.append(out[start:start + b * h * w].reshape(b, h, w, cout))
        start += b * h * w
    return outs


def deform_conv2d(
    feat: jnp.ndarray,
    offsets: jnp.ndarray,
    weight: jnp.ndarray,
    kernel_size: int = 3,
) -> jnp.ndarray:
    """DCNv1 forward.

    Args:
      feat: (B, H, W, Cin) input features.
      offsets: (B, H, W, 2*K) deformation offsets, (dy, dx) per position k
        *relative to the base grid* (the caller passes pts - base like the
        reference head, so effective sample = p0 + pts).
      weight: (K, Cin, Cout) kernel (k row-major over the kernel window).

    Returns:
      (B, H, W, Cout). Stride 1, zero padding, no bias (reference DeformConv
      in the head has bias=False).
    """
    b, h, w, cin = feat.shape
    k = weight.shape[0]
    # coordinates in f32 regardless of the compute dtype: bf16 has ~8
    # mantissa bits, so a bf16 coordinate near x=128 quantizes to ~0.5 px
    # — unacceptable for bilinear sampling (the gather indices and lerp
    # weights both derive from these)
    off = offsets.astype(jnp.float32) + jnp.asarray(
        dcn_base_offset(kernel_size), jnp.float32
    )  # (B,H,W,2K): absolute (dy,dx) from output pixel
    off = off.reshape(b, h, w, k, 2)
    iy = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
    ix = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
    py = off[..., 0] + iy  # (B,H,W,K)
    px = off[..., 1] + ix
    samples = bilinear_gather(feat, py, px)  # (B,H,W,K,Cin)
    return jnp.einsum(
        "bhwkc,kco->bhwo",
        samples,
        weight.astype(samples.dtype),
        preferred_element_type=jnp.float32,
    ).astype(feat.dtype)
