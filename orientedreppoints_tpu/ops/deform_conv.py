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

import functools
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


def _pyramid_plan(shapes, offsets, kernel_size: int):
    """Shared sampling plan for pyramid-fused DCN.

    Flattens every (level, image, pixel, kernel-position) sample into one
    global row space over the concatenated (sum_l B*H_l*W_l, C) feature
    table and returns, concatenated across levels:
      idx: 4 int32 (N,) row indices, one per bilinear corner;
      ok:  4 bool  (N,) in-bounds masks;
      wy, wx: (N,) f32 bilinear lerp weights.

    shapes: static per-level (B, H_l, W_l) tuples.
    """
    return _pyramid_plan_ext(shapes, offsets, kernel_size,
                             with_win=False)[:4]


def _pyramid_plan_ext(shapes, offsets, kernel_size: int,
                      with_win: bool = True):
    """_pyramid_plan plus the x-pair window plan for the scatter backward.

    The two x-adjacent bilinear corners of a sample hit CONTIGUOUS rows of
    the flattened feature table (row = y*w + x), so the backward can
    scatter each (dy=0 / dy=1) corner pair as ONE (2, C)-window update at
    a window start ws = y_clip*w + clip(x0, 0, w-2) — halving scatter
    indices vs per-corner scatters.  Because the start is clamped to keep
    the window in-bounds, the lane a corner lands in shifts at the image
    borders; the returned masks select lanes:
      m_a: x0 == xs        (interior: corner dx=0 -> lane 0, dx=1 -> 1)
      m_b: x0 + 1 == xs    (left edge x0=-1: corner dx=1 -> lane 0)
      m_c: x0 == xs + 1    (right edge x0=w-1: corner dx=0 -> lane 1)
    Out-of-bounds corners are already zeroed via ok, so clamped window
    rows only ever receive zero contributions.

    Returns (idx, ok, wy, wx, (ws0, ws1, m_a, m_b, m_c)) with ws0/ws1 the
    flat window starts for the dy=0 / dy=1 pairs.

    with_win=False skips tracing the window plan entirely (win = None) so
    forward-only graphs stay IDENTICAL to the plain-plan formulation —
    the windowed backward recomputes the plan from its offsets residual
    instead of carrying win through fwd residuals.
    """
    k = kernel_size * kernel_size
    b = shapes[0][0]
    base = jnp.asarray(dcn_base_offset(kernel_size), jnp.float32)
    idxs = [[], [], [], []]
    oks = [[], [], [], []]
    wys, wxs = [], []
    ws0s, ws1s, mas, mbs, mcs = [], [], [], [], []
    lvl_base = 0
    for (_, h, w), o in zip(shapes, offsets):
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
        if with_win:
            # max(w-2, 0) keeps degenerate w==1 levels legal; any window
            # row beyond the true extent only receives zero (masked) lanes
            xs = jnp.clip(x0, 0, max(w - 2, 0))
            ws0s.append(
                (jnp.clip(y0, 0, h - 1) * w + xs + row0).reshape(-1))
            ws1s.append(
                (jnp.clip(y0 + 1, 0, h - 1) * w + xs + row0).reshape(-1))
            mas.append((x0 == xs).reshape(-1))
            mbs.append((x0 + 1 == xs).reshape(-1))
            mcs.append((x0 == xs + 1).reshape(-1))
        lvl_base += b * h * w

    idx = [jnp.concatenate(x) for x in idxs]
    ok = [jnp.concatenate(x) for x in oks]
    wy = jnp.concatenate(wys)
    wx = jnp.concatenate(wxs)
    win = (jnp.concatenate(ws0s), jnp.concatenate(ws1s),
           jnp.concatenate(mas), jnp.concatenate(mbs),
           jnp.concatenate(mcs)) if with_win else None
    return idx, ok, wy, wx, win


def _split_levels(flat_rows: jnp.ndarray, feats: list, chans: int) -> list:
    """(sum_l B*H_l*W_l, chans) rows -> per-level (B, H_l, W_l, chans)."""
    outs = []
    start = 0
    for f in feats:
        b, h, w, _ = f.shape
        outs.append(flat_rows[start:start + b * h * w].reshape(b, h, w,
                                                               chans))
        start += b * h * w
    return outs


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

    flat = jnp.concatenate([f.reshape(-1, c) for f in feats], axis=0)
    shapes = tuple(f.shape[:3] for f in feats)
    idx, ok, wy, wx = _pyramid_plan(shapes, offsets, kernel_size)
    wy = wy[:, None].astype(flat.dtype)
    wx = wx[:, None].astype(flat.dtype)

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
    return _split_levels(out, feats, weight.shape[-1])


def _pair_corners(flat_a, flat_b, idx, ok):
    """Per-corner takes for the two paired instances.

    Default ("narrow"): 8 independent (N, C)-row takes — 4 per instance;
    independent takes overlap nearly perfectly on TPU (DESIGN.md s8).
    ORP_PAIR_GATHER=cat: channel-concatenate both tables into (rows, 2C)
    and issue 4 (N, 2C)-row takes — half the gather rows at double the
    row width.  Gather throughput RISES with row width (~30 GB/s @512 B
    -> ~70 GB/s @2 KB, s8), so at C=256 bf16 (512 B -> 1 KB rows) the
    paired form is a measurable candidate; A/B on chip via
    tools/bench_dcn_gather.py before changing the default.
    """
    if os.environ.get("ORP_PAIR_GATHER", "narrow") == "cat":
        c = flat_a.shape[-1]
        flat_cat = jnp.concatenate([flat_a, flat_b], axis=-1)
        v = [
            jnp.take(flat_cat, i, axis=0) * o[:, None].astype(flat_cat.dtype)
            for i, o in zip(idx, ok)
        ]
        return [x[:, :c] for x in v], [x[:, c:] for x in v]
    va = [
        jnp.take(flat_a, i, axis=0) * o[:, None].astype(flat_a.dtype)
        for i, o in zip(idx, ok)
    ]
    vb = [
        jnp.take(flat_b, i, axis=0) * o[:, None].astype(flat_b.dtype)
        for i, o in zip(idx, ok)
    ]
    return va, vb


def _lerp_weights(wy, wx, dtype):
    wyc = wy[:, None].astype(dtype)
    wxc = wx[:, None].astype(dtype)
    return ((1 - wyc) * (1 - wxc), (1 - wyc) * wxc,
            wyc * (1 - wxc), wyc * wxc), wyc, wxc


def _combine(v, cw, k, c):
    return (v[0] * cw[0] + v[1] * cw[1] + v[2] * cw[2]
            + v[3] * cw[3]).reshape(-1, k, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _pair_core(kernel_size, shapes, flat_a, flat_b, offsets, weight_a,
               weight_b):
    (out_a, out_b), _ = _pair_core_fwd_impl(
        kernel_size, shapes, flat_a, flat_b, offsets, weight_a, weight_b)
    return out_a, out_b


def _pair_core_fwd_impl(kernel_size, shapes, flat_a, flat_b, offsets,
                        weight_a, weight_b):
    k = kernel_size * kernel_size
    c = flat_a.shape[-1]
    idx, ok, wy, wx = _pyramid_plan(shapes, offsets, kernel_size)
    va, vb = _pair_corners(flat_a, flat_b, idx, ok)
    cw, _, _ = _lerp_weights(wy, wx, flat_a.dtype)
    sa = _combine(va, cw, k, c)
    sb = _combine(vb, cw, k, c)
    out_a = jnp.einsum(
        "nkc,kco->no", sa, weight_a.astype(sa.dtype),
        preferred_element_type=jnp.float32,
    ).astype(flat_a.dtype)
    out_b = jnp.einsum(
        "nkc,kco->no", sb, weight_b.astype(sb.dtype),
        preferred_element_type=jnp.float32,
    ).astype(flat_b.dtype)
    # residuals: corner values (same liveness autodiff would keep for the
    # lerp-weight grads), plan arrays, weights, offsets (tiny, for dtype/
    # structure of their cotangent)
    res = (idx, ok, wy, wx, va, vb, weight_a, weight_b, offsets)
    return (out_a, out_b), res


def _pair_core_fwd(kernel_size, shapes, flat_a, flat_b, offsets, weight_a,
                   weight_b):
    return _pair_core_fwd_impl(kernel_size, shapes, flat_a, flat_b, offsets,
                               weight_a, weight_b)


def _pair_core_bwd(kernel_size, shapes, res, g):
    idx, ok, wy, wx, va, vb, weight_a, weight_b, offsets = res
    g_a, g_b = g
    k = kernel_size * kernel_size
    c = va[0].shape[-1]
    dt = va[0].dtype
    rows = sum(b * h * w for b, h, w in shapes)

    # grad wrt samples: (P, K, Cout) x (K, C, Cout) -> (P, K, C) rows
    gs_a = jnp.einsum(
        "no,kco->nkc", g_a.astype(dt), weight_a.astype(dt),
        preferred_element_type=jnp.float32,
    ).reshape(-1, c)
    gs_b = jnp.einsum(
        "no,kco->nkc", g_b.astype(dt), weight_b.astype(dt),
        preferred_element_type=jnp.float32,
    ).reshape(-1, c)

    cw, wyc, wxc = _lerp_weights(wy, wx, dt)
    gs_a_dt = gs_a.astype(dt)
    gs_b_dt = gs_b.astype(dt)

    # --- feature-table grads ---------------------------------------------
    # Both instances share idx/ok, and TPU scatter cost is per scatter
    # index (DESIGN s10: two (N, C) scatters cost ~35% more than one
    # (N, 2C) scatter of the same payload), so the corner grads are
    # concatenated channel-wise into (N, 2C) rows.  Two formulations:
    #   combined: 4 per-corner (N, 2C)-row scatters (round-3 baseline);
    #   window:   2 scatters of (N, 2, 2C) windows — the x-adjacent
    #             corners land in CONTIGUOUS table rows, so each dy pair
    #             is one windowed update at ws = y*w + clip(x0, 0, w-2),
    #             halving scatter indices again.  Border lanes selected
    #             by the m_a/m_b/m_c masks (_pyramid_plan_ext).
    def corner_rows(i):
        return jnp.concatenate(
            [gs_a_dt * cw[i], gs_b_dt * cw[i]], axis=-1
        ) * ok[i][:, None].astype(dt)

    if os.environ.get("ORP_PAIR_SCATTER", "combined") == "window":
        # recompute the window plan from the offsets residual (elementwise,
        # trivially cheap next to the scatters) so forward graphs never
        # carry win arrays and stay identical to the plain formulation
        cv = [corner_rows(i) for i in range(4)]
        _, _, _, _, win = _pyramid_plan_ext(shapes, offsets, kernel_size)
        ws0, ws1, m_a, m_b, m_c = win
        ma = m_a[:, None].astype(dt)
        mb = m_b[:, None].astype(dt)
        mc = m_c[:, None].astype(dt)
        dn = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2),
            inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0,),
        )
        # one pad row: window starts are in [0, rows-1], so [ws, ws+1]
        # stays in-bounds of the padded table even for w==1 levels where
        # the (always zero) second lane can point one past the level end
        gtab = jnp.zeros((rows + 1, 2 * c), dt)
        for ws, (c0, c1) in ((ws0, (cv[0], cv[1])), (ws1, (cv[2], cv[3]))):
            upd = jnp.stack(
                [c0 * ma + c1 * mb, c1 * ma + c0 * mc], axis=1)
            gtab = jax.lax.scatter_add(
                gtab, ws[:, None], upd, dn,
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )
        gtab = gtab[:rows]
    else:
        gtab = jnp.zeros((rows, 2 * c), dt)
        for i in range(4):
            gtab = gtab.at[idx[i]].add(corner_rows(i))
    gflat_a = gtab[:, :c]
    gflat_b = gtab[:, c:]

    # --- weight grads (recompute samples from the corner residuals) -----
    sa = _combine(va, cw, k, c)
    sb = _combine(vb, cw, k, c)
    gw_a = jnp.einsum(
        "nkc,no->kco", sa, g_a.astype(dt),
        preferred_element_type=jnp.float32,
    ).astype(weight_a.dtype)
    gw_b = jnp.einsum(
        "nkc,no->kco", sb, g_b.astype(dt),
        preferred_element_type=jnp.float32,
    ).astype(weight_b.dtype)

    # --- offset grads (both instances flow into the SHARED offsets) -----
    one = jnp.ones_like(wyc)
    ddy_a = (va[2] - va[0]) * (one - wxc) + (va[3] - va[1]) * wxc
    ddx_a = (va[1] - va[0]) * (one - wyc) + (va[3] - va[2]) * wyc
    ddy_b = (vb[2] - vb[0]) * (one - wxc) + (vb[3] - vb[1]) * wxc
    ddx_b = (vb[1] - vb[0]) * (one - wyc) + (vb[3] - vb[2]) * wyc
    gwy = jnp.sum(gs_a * ddy_a.astype(jnp.float32)
                  + gs_b * ddy_b.astype(jnp.float32), axis=-1)  # (N,)
    gwx = jnp.sum(gs_a * ddx_a.astype(jnp.float32)
                  + gs_b * ddx_b.astype(jnp.float32), axis=-1)

    goffsets = []
    start = 0
    for (b, h, w), o in zip(shapes, offsets):
        n_l = b * h * w * k
        gy = gwy[start:start + n_l].reshape(b, h, w, k)
        gx = gwx[start:start + n_l].reshape(b, h, w, k)
        goffsets.append(
            jnp.stack([gy, gx], axis=-1).reshape(b, h, w, 2 * k)
            .astype(o.dtype)
        )
        start += n_l

    return gflat_a, gflat_b, tuple(goffsets), gw_a, gw_b


_pair_core.defvjp(_pair_core_fwd, _pair_core_bwd)


def deform_conv2d_pyramid_pair(
    feats_a: list,
    feats_b: list,
    offsets: list,
    weight_a: jnp.ndarray,
    weight_b: jnp.ndarray,
    kernel_size: int = 3,
):
    """Two pyramid-fused DCN instances sharing one set of sampling offsets.

    The head's cls and refine DCNs (orientedreppoints_head.py:163-166)
    sample at IDENTICAL locations (same pts - base offsets) over different
    feature towers.  Forward stays the overlapped 2x4-corner-take form of
    deform_conv2d_pyramid (wide-row gathers measured slower); the custom
    backward combines both instances' per-corner feature-table scatters
    into 4 (N, 2C)-row scatters instead of autodiff's 8 (N, C) ones —
    TPU scatter-add cost is per-row, so this saves ~4.6 ms/corner at
    1024^2/B2 (DESIGN.md s10, measured).

    Returns (outs_a, outs_b): per-level (B, H_l, W_l, Cout) lists.
    """
    c = feats_a[0].shape[-1]
    shapes = tuple(f.shape[:3] for f in feats_a)
    flat_a = jnp.concatenate([f.reshape(-1, c) for f in feats_a], axis=0)
    flat_b = jnp.concatenate([f.reshape(-1, c) for f in feats_b], axis=0)
    out_a, out_b = _pair_core(
        kernel_size, shapes, flat_a, flat_b, tuple(offsets), weight_a,
        weight_b,
    )
    return (
        _split_levels(out_a, feats_a, weight_a.shape[-1]),
        _split_levels(out_b, feats_b, weight_b.shape[-1]),
    )


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
