"""Fused Pallas TPU kernels for exact pairwise convex-polygon IoU.

These replace the vmapped-XLA pair kernels on the hot paths (rotated NMS's
(N, N) matrix and the refine assigner's (G, N) matrix).  One output tile is
(8 sublanes x 128 lanes) of pairs; all geometry runs as unrolled static
loops of elementwise VPU ops — no gathers, no sorts, no tiny matmuls (each
of which serializes or pads to MXU tiles under vmap).

Algorithm per pair: Sutherland-Hodgman clip of the subject polygon by the
4 half-planes of the (CCW-oriented) clip quad, with cumulative-position
one-hot compaction, then masked shoelace.  Matches the reference CUDA
semantics (mmdet/ops/iou/src/convex_iou_kernel.cu) to f32 precision.

Subject variants:
  * quad subject (4 verts)  -> rnms pairwise IoU (rnms_kernel.cu)
  * hull subject (<=9 verts + count) -> convex_overlaps for the assigner
    (convex hull computed once per point set outside the kernel).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TM = 8  # sublanes: subject rows per tile
TN = 128  # lanes: clip rows per tile
TM_OVER = 64  # rows per tile for the fused NMS over-mask kernel (see below)
_EPS = 1e-8


def _shoelace_quad(x, y):
    """Signed 2x area of a 4-gon given lists of 4 coordinate arrays."""
    s = 0.0
    for k in range(4):
        kn = (k + 1) % 4
        s = s + (x[k] * y[kn] - x[kn] * y[k])
    return s


def _clip_stage(vx, vy, cnt, ex, ey, e0x, e0y, out_cap):
    """One half-plane clip: keep the side left of edge (e0 -> e0+e).

    vx/vy: lists of (TM, TN) vertex coords; cnt: (TM, TN) int32 count.
    Returns new (vx, vy, cnt) with out_cap slots.
    """
    cap = len(vx)
    side = [ex * (vy[j] - e0y) - ey * (vx[j] - e0x) for j in range(cap)]

    cand_x, cand_y, emit = [], [], []
    for j in range(cap):
        jn = (j + 1) % cap
        wrap = cnt == (j + 1)
        nx = jnp.where(wrap, vx[0], vx[jn])
        ny = jnp.where(wrap, vy[0], vy[jn])
        s_nxt = jnp.where(wrap, side[0], side[jn])
        valid = cnt > j
        in_cur = side[j] >= 0
        in_nxt = s_nxt >= 0
        denom = side[j] - s_nxt
        t = side[j] / jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
        ix = vx[j] + t * (nx - vx[j])
        iy = vy[j] + t * (ny - vy[j])
        # slot 0: crossing point; slot 1: next vertex when inside
        cand_x += [ix, nx]
        cand_y += [iy, ny]
        emit += [valid & (in_cur != in_nxt), valid & in_nxt]

    zeros_i = jnp.zeros_like(cnt)
    pos = []
    running = zeros_i
    for e in emit:
        pos.append(running)
        running = running + e.astype(jnp.int32)

    new_vx, new_vy = [], []
    for jo in range(out_cap):
        ox = jnp.zeros_like(cand_x[0])
        oy = jnp.zeros_like(cand_y[0])
        for c in range(len(emit)):
            put = emit[c] & (pos[c] == jo)
            ox = jnp.where(put, cand_x[c], ox)
            oy = jnp.where(put, cand_y[c], oy)
        new_vx.append(ox)
        new_vy.append(oy)
    return new_vx, new_vy, running


def _masked_shoelace_slots(vx, vy, cnt):
    """Signed 2x area over the first cnt slots (ring with wrap at cnt)."""
    cap = len(vx)
    s = 0.0
    for j in range(cap):
        jn = (j + 1) % cap
        wrap = cnt == (j + 1)
        nx = jnp.where(wrap, vx[0], vx[jn])
        ny = jnp.where(wrap, vy[0], vy[jn])
        term = vx[j] * ny - nx * vy[j]
        s = s + jnp.where(cnt > j, term, 0.0)
    return s


def _iou_from_subject(sub_x, sub_y, sub_cnt, sub_area2, b_ref):
    """Shared tail: orient clip quad CCW, clip, emit IoU tile.

    sub_x/sub_y: subject vertex lists ((TM, TN) each); b_ref: (8, TN).
    """
    bx = [b_ref[2 * k : 2 * k + 1, :] for k in range(4)]
    by = [b_ref[2 * k + 1 : 2 * k + 2, :] for k in range(4)]
    area2_b = _shoelace_quad(bx, by)  # (1, TN)
    flip = area2_b < 0
    ccw = lambda arr, k: jnp.where(flip, arr[(4 - k) % 4], arr[k])
    bxc = [ccw(bx, k) for k in range(4)]
    byc = [ccw(by, k) for k in range(4)]

    vx, vy, cnt = sub_x, sub_y, sub_cnt
    cap = len(vx)
    for e in range(4):
        en = (e + 1) % 4
        ex = bxc[en] - bxc[e]
        ey = byc[en] - byc[e]
        cap = min(cap + 1, len(vx) + 4)
        vx, vy, cnt = _clip_stage(vx, vy, cnt, ex, ey, bxc[e], byc[e], cap)

    inter = 0.5 * jnp.abs(_masked_shoelace_slots(vx, vy, cnt))
    area_a = 0.5 * jnp.abs(sub_area2)
    area_b = 0.5 * jnp.abs(area2_b)
    union = jnp.maximum(area_a + area_b - inter, _EPS)
    return inter / union


def _quad_tile(a, bt):
    """a: (TM, 8) subject quads; bt: (8, TN) clip quads (transposed).
    Returns the (TM, TN) IoU tile."""
    # recenter every pair at the clip quad's first vertex for f32 safety
    # (class-offset NMS coordinates reach ~3e4)
    ox = bt[0:1, :]
    oy = bt[1:2, :]
    ax = [a[:, 2 * k : 2 * k + 1] - ox for k in range(4)]
    ay = [a[:, 2 * k + 1 : 2 * k + 2] - oy for k in range(4)]
    area2_a = _shoelace_quad(ax, ay)
    b_cent = bt - jnp.tile(jnp.concatenate([ox, oy], axis=0), (4, 1))
    cnt = jnp.full(ax[0].shape, 4, jnp.int32) + jnp.zeros(
        (1, bt.shape[1]), jnp.int32
    )
    return _iou_from_subject(ax, ay, cnt, area2_a, b_cent)


def _quad_kernel(a_ref, b_ref, out_ref):
    out_ref[:, :] = _quad_tile(a_ref[:, :], b_ref[:, :])


def _make_quad_kernel_tri(row_dim: int, col_dim: int,
                          batch_dim: int | None = None):
    """Upper-triangle kernel variant for greedy NMS, with a valid-prefix
    skip.

    Tiles are written as zeros (no clipping done) when either
      * every column index is <= every row index — the suppression scan
        only reads entries with col > row; at (8, 128) tiles this alone
        skips ~48% of a square matrix — or
      * the tile lies beyond the valid-candidate prefix (rows are score-
        sorted, so candidates above the score threshold form a prefix of
        length nvalid): rows >= nvalid never suppress and columns >=
        nvalid never matter.  This mirrors the reference CUDA/host NMS,
        which only ever processes thresholded boxes
        (mmdet/ops/nms/src/rnms_kernel.cu operates on the filtered set) —
        on TPU the shapes stay static and the skip is a cheap tile
        predicate.

    The kernel takes a scalar-prefetch ref with per-image valid counts
    (shape (B,) — index with the batch grid dim, or (1,) when
    batch_dim=None).  row_dim/col_dim: grid dims carrying row/col tile
    ids."""

    def kernel(nv_ref, a_ref, b_ref, out_ref):
        i = pl.program_id(row_dim)
        j = pl.program_id(col_dim)
        nv = nv_ref[0 if batch_dim is None else pl.program_id(batch_dim)]
        needed = (
            (j * TN + (TN - 1) > i * TM)  # max col in tile > min row
            & (i * TM < nv)
            & (j * TN < nv)
        )

        @pl.when(needed)
        def _():
            rows = i * TM + jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 0)
            cols = j * TN + jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 1)
            tile = _quad_tile(a_ref[:, :], b_ref[:, :])
            live = (cols > rows) & (rows < nv) & (cols < nv)
            out_ref[:, :] = jnp.where(live, tile, 0.0)

        @pl.when(jnp.logical_not(needed))
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref)

    return kernel




def _make_quad_over_kernel(row_dim: int, col_dim: int, iou_thr: float,
                           batch_dim: int | None = None):
    """Fused NMS suppression-mask kernel: emits int8 (iou > iou_thr) tiles
    directly (upper triangle + valid-prefix only, rest zero).

    Differences from the f32 tri kernel that matter for speed:
      * (TM_OVER, TN) = (64, 128) tiles — the (8, 128) tri kernel's grid at
        4096 candidates x batch 4 is 65k steps and is DISPATCH-bound: ~15 ms
        even when num_valid = 0 skips every tile (block DMAs + zero stores
        run regardless of pl.when).  8x fewer steps puts the empty-scene
        cost near zero and the full-scene cost at the VPU clip-compute
        floor.
      * int8 output — the downstream greedy scan only consumes iou > thr,
        so thresholding in-kernel deletes the (B, N, N) f32 round trip
        (268 MB at B4/N4096) that the separate XLA compare pass cost.
    iou_thr is baked statically (it is a config literal in every caller).
    """

    def kernel(nv_ref, a_ref, b_ref, out_ref):
        i = pl.program_id(row_dim)
        j = pl.program_id(col_dim)
        nv = nv_ref[0 if batch_dim is None else pl.program_id(batch_dim)]
        needed = (
            (j * TN + (TN - 1) > i * TM_OVER)
            & (i * TM_OVER < nv)
            & (j * TN < nv)
        )

        @pl.when(needed)
        def _():
            rows = i * TM_OVER + jax.lax.broadcasted_iota(
                jnp.int32, (TM_OVER, TN), 0)
            cols = j * TN + jax.lax.broadcasted_iota(
                jnp.int32, (TM_OVER, TN), 1)
            tile = _quad_tile(a_ref[:, :], b_ref[:, :])
            live = (cols > rows) & (rows < nv) & (cols < nv)
            out_ref[:, :] = (live & (tile > iou_thr)).astype(jnp.int8)

        @pl.when(jnp.logical_not(needed))
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref)

    return kernel


def quad_over_matrix_pallas(
    quads: jnp.ndarray,
    iou_thr: float,
    num_valid: jnp.ndarray | None = None,
):
    """(N, 8) score-sorted quads -> (N, N) bool suppression mask
    (over[i, j] = IoU > iou_thr, upper triangle within the valid prefix).

    iou_thr must be a static Python float. See _make_quad_over_kernel."""
    n = quads.shape[0]
    if num_valid is None:
        num_valid = jnp.int32(n)
    if _use_xla_fallback():
        from .geometry import quad_iou_matrix

        iou = quad_iou_matrix(quads, quads)
        rows = jnp.arange(n)[:, None]
        cols = jnp.arange(n)[None, :]
        return (iou > iou_thr) & (cols > rows) & (rows < num_valid) & (
            cols < num_valid)
    a = _pad_to(quads.astype(jnp.float32), TM_OVER, 0)
    bt = _pad_to(quads.astype(jnp.float32), TN, 0).T
    np_, mp = a.shape[0], bt.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(np_ // TM_OVER, mp // TN),
        in_specs=[
            pl.BlockSpec((TM_OVER, 8), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TN), lambda i, j, *_: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM_OVER, TN), lambda i, j, *_: (i, j),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _make_quad_over_kernel(0, 1, float(iou_thr)),
        out_shape=jax.ShapeDtypeStruct((np_, mp), jnp.int8),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(jnp.reshape(num_valid, (1,)).astype(jnp.int32), a, bt)
    return out[:n, :n] != 0


def quad_over_matrix_batch_pallas(
    quads: jnp.ndarray,
    iou_thr: float,
    num_valid: jnp.ndarray | None = None,
):
    """(B, N, 8) -> (B, N, N) bool suppression mask; batched
    quad_over_matrix_pallas (one launch for the whole image batch)."""
    b, n, _ = quads.shape
    if num_valid is None:
        num_valid = jnp.full((b,), n, jnp.int32)
    if _use_xla_fallback():
        from .geometry import quad_iou_matrix

        iou = jax.vmap(quad_iou_matrix)(quads, quads)
        rows = jnp.arange(n)[None, :, None]
        cols = jnp.arange(n)[None, None, :]
        nv = num_valid[:, None, None]
        return (iou > iou_thr) & (cols > rows) & (rows < nv) & (cols < nv)
    a = _pad_to(quads.astype(jnp.float32), TM_OVER, 1).reshape(-1, 8)
    bb = _pad_to(quads.astype(jnp.float32), TN, 1)
    bt = bb.transpose(0, 2, 1).reshape(-1, bb.shape[1])  # (B*8, Mp)
    np_ = a.shape[0] // b
    mp = bt.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, np_ // TM_OVER, mp // TN),
        in_specs=[
            pl.BlockSpec(
                (TM_OVER, 8),
                lambda bi, i, j, *_, _n=np_ // TM_OVER: (bi * _n + i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((8, TN), lambda bi, i, j, *_: (bi, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TM_OVER, TN),
            lambda bi, i, j, *_, _n=np_ // TM_OVER: (bi * _n + i, j),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        _make_quad_over_kernel(1, 2, float(iou_thr), batch_dim=0),
        out_shape=jax.ShapeDtypeStruct((b * np_, mp), jnp.int8),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(num_valid.astype(jnp.int32), a, bt)
    return out.reshape(b, np_, mp)[:, :n, :n] != 0


def _hull_kernel(h_ref, c_ref, b_ref, out_ref):
    """h_ref: (TM, 18) subject hull verts (padded by repeating v0);
    c_ref: (TM, 1) int32 vertex counts; b_ref: (8, TN); out: (TM, TN)."""
    ox = b_ref[0:1, :]
    oy = b_ref[1:2, :]
    hx = [h_ref[:, 2 * k : 2 * k + 1] - ox for k in range(9)]
    hy = [h_ref[:, 2 * k + 1 : 2 * k + 2] - oy for k in range(9)]
    cnt0 = c_ref[:, 0:1] + jnp.zeros((1, b_ref.shape[1]), jnp.int32)
    area2 = _masked_shoelace_slots(hx, hy, cnt0)
    b_cent = b_ref[:, :] - jnp.tile(
        jnp.concatenate([ox, oy], axis=0), (4, 1)
    )
    out_ref[:, :] = _iou_from_subject(hx, hy, cnt0, area2, b_cent)


def _pad_to(x, m, axis):
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _use_xla_fallback() -> bool:
    """On non-TPU backends, prefer the parity-tested vmapped-XLA paths:
    Pallas interpret mode re-executes the unrolled kernel body per grid
    step in Python, which is prohibitively slow at real sizes.  Set
    ORP_FORCE_PALLAS_INTERPRET=1 to exercise the kernels anyway (used by
    the dedicated kernel-parity tests on tiny shapes)."""
    if os.environ.get("ORP_FORCE_PALLAS_INTERPRET"):
        return False
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("upper_tri",))
def quad_iou_matrix_pallas(
    quads_a: jnp.ndarray,
    quads_b: jnp.ndarray,
    upper_tri: bool = False,
    num_valid: jnp.ndarray | None = None,
):
    """(N, 8) x (M, 8) -> (N, M) exact convex-quad IoU (f32).

    upper_tri=True computes only entries with col > row (rest are 0) —
    sufficient for the greedy NMS scan over score-sorted rows and ~2x
    cheaper on square matrices.  num_valid (traced scalar, only with
    upper_tri) additionally zero-skips all tiles at or beyond the
    valid-candidate prefix.
    """
    n, m = quads_a.shape[0], quads_b.shape[0]
    if num_valid is None:
        num_valid = jnp.int32(n)
    if _use_xla_fallback():
        from .geometry import quad_iou_matrix

        iou = quad_iou_matrix(quads_a, quads_b)
        if upper_tri:
            rows = jnp.arange(n)[:, None]
            cols = jnp.arange(m)[None, :]
            iou = iou * ((cols > rows) & (rows < num_valid)
                         & (cols < num_valid))
        return iou
    a = _pad_to(quads_a.astype(jnp.float32), TM, 0)
    b = _pad_to(quads_b.astype(jnp.float32), TN, 0)
    bt = b.T  # (8, Mp)
    np_, mp = a.shape[0], bt.shape[1]
    if upper_tri:
        # index maps receive the scalar-prefetch ref as a trailing arg
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(np_ // TM, mp // TN),
            in_specs=[
                pl.BlockSpec((TM, 8), lambda i, j, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, TN), lambda i, j, *_: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda i, j, *_: (i, j),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            _make_quad_kernel_tri(0, 1),
            out_shape=jax.ShapeDtypeStruct((np_, mp), jnp.float32),
            grid_spec=grid_spec,
            interpret=_interpret(),
        )(jnp.reshape(num_valid, (1,)).astype(jnp.int32), a, bt)
        return out[:n, :m]
    out = pl.pallas_call(
        _quad_kernel,
        out_shape=jax.ShapeDtypeStruct((np_, mp), jnp.float32),
        grid=(np_ // TM, mp // TN),
        in_specs=[
            pl.BlockSpec((TM, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(a, bt)
    return out[:n, :m]


def quad_iou_matrix_batch_pallas(
    quads_a: jnp.ndarray,
    quads_b: jnp.ndarray,
    upper_tri: bool = False,
    num_valid: jnp.ndarray | None = None,
):
    """Batched pairwise IoU: (B, N, 8) x (B, M, 8) -> (B, N, M).

    One kernel launch for the whole batch (used by the batched rotated NMS
    so per-image matrices don't serialize).  upper_tri / num_valid
    ((B,) per-image valid-prefix lengths): see quad_iou_matrix_pallas.
    """
    b, n, _ = quads_a.shape
    m = quads_b.shape[1]
    if num_valid is None:
        num_valid = jnp.full((b,), n, jnp.int32)
    if _use_xla_fallback():
        from .geometry import quad_iou_matrix

        iou = jax.vmap(quad_iou_matrix)(quads_a, quads_b)
        if upper_tri:
            rows = jnp.arange(n)[None, :, None]
            cols = jnp.arange(m)[None, None, :]
            nv = num_valid[:, None, None]
            iou = iou * ((cols > rows) & (rows < nv) & (cols < nv))
        return iou
    a = _pad_to(quads_a.astype(jnp.float32), TM, 1).reshape(-1, 8)  # (B*Np, 8)
    bb = _pad_to(quads_b.astype(jnp.float32), TN, 1)
    bt = bb.transpose(0, 2, 1).reshape(-1, bb.shape[1])  # (B*8, Mp)
    np_ = a.shape[0] // b
    mp = bt.shape[1]
    # fold the batch into the row dimension so every block stays 2D and
    # lane-aligned (a leading singleton block dim defeats (8,128) tiling)
    # *_: tolerate the scalar-prefetch ref appended to index-map args
    in_specs = [
        pl.BlockSpec(
            (TM, 8),
            lambda bi, i, j, *_, _n=np_ // TM: (bi * _n + i, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((8, TN), lambda bi, i, j, *_: (bi, j),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = pl.BlockSpec(
        (TM, TN),
        lambda bi, i, j, *_, _n=np_ // TM: (bi * _n + i, j),
        memory_space=pltpu.VMEM,
    )
    if upper_tri:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, np_ // TM, mp // TN),
            in_specs=in_specs,
            out_specs=out_specs,
        )
        out = pl.pallas_call(
            _make_quad_kernel_tri(1, 2, batch_dim=0),
            out_shape=jax.ShapeDtypeStruct((b * np_, mp), jnp.float32),
            grid_spec=grid_spec,
            interpret=_interpret(),
        )(num_valid.astype(jnp.int32), a, bt)
    else:
        out = pl.pallas_call(
            _quad_kernel,
            out_shape=jax.ShapeDtypeStruct((b * np_, mp), jnp.float32),
            grid=(b, np_ // TM, mp // TN),
            in_specs=in_specs,
            out_specs=out_specs,
            interpret=_interpret(),
        )(a, bt)
    return out.reshape(b, np_, mp)[:, :n, :m]


def hull_quad_iou_matrix_pallas(
    hulls: jnp.ndarray, counts: jnp.ndarray, quads: jnp.ndarray
):
    """(N, 9, 2) hulls (+ (N,) counts) x (M, 8) quads -> (N, M) IoU."""
    if _use_xla_fallback():
        from .geometry import (
            _EPS, convex_intersection_area, polygon_area,
        )

        def pair(hull, cnt, quad):
            inter = convex_intersection_area(hull, cnt, quad.reshape(4, 2))
            ap = polygon_area(hull, cnt)
            aq = polygon_area(quad.reshape(4, 2))
            return inter / jnp.maximum(ap + aq - inter, _EPS)

        return jax.vmap(
            jax.vmap(pair, in_axes=(None, None, 0)), in_axes=(0, 0, None)
        )(hulls, counts, quads)
    n, m = hulls.shape[0], quads.shape[0]
    h = _pad_to(hulls.reshape(n, 18).astype(jnp.float32), TM, 0)
    c = _pad_to(counts.reshape(n, 1).astype(jnp.int32), TM, 0)
    b = _pad_to(quads.astype(jnp.float32), TN, 0)
    bt = b.T
    np_, mp = h.shape[0], bt.shape[1]
    out = pl.pallas_call(
        _hull_kernel,
        out_shape=jax.ShapeDtypeStruct((np_, mp), jnp.float32),
        grid=(np_ // TM, mp // TN),
        in_specs=[
            pl.BlockSpec((TM, 18), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(h, c, bt)
    return out[:n, :m]
