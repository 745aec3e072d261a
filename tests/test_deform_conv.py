"""DCNv1 parity vs a direct numpy bilinear-im2col oracle.

The oracle mirrors the reference CUDA semantics
(mmdet/ops/dcn/src/deform_conv_cuda_kernel.cu): sample at
p0 + base_k + offset_k with bilinear interpolation and zero padding, then
contract with the kernel.  torch.nn.functional.conv2d checks the
zero-offset special case.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orientedreppoints_tpu.ops.deform_conv import deform_conv2d, dcn_base_offset

torch = pytest.importorskip("torch")


def _bilinear(feat, y, x):
    """feat (H, W, C); zero outside."""
    h, w, c = feat.shape
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    out = np.zeros((c,), dtype=np.float64)
    for yy, wy in ((y0, 1 - (y - y0)), (y0 + 1, y - y0)):
        for xx, wx in ((x0, 1 - (x - x0)), (x0 + 1, x - x0)):
            if 0 <= yy < h and 0 <= xx < w:
                out = out + feat[yy, xx] * wy * wx
    return out


def _dcn_oracle(feat, rel, weight):
    b, h, w, cin = feat.shape
    k, _, cout = weight.shape
    base = dcn_base_offset(3).reshape(9, 2)
    out = np.zeros((b, h, w, cout), dtype=np.float64)
    for bi in range(b):
        for i in range(h):
            for j in range(w):
                for kk in range(k):
                    dy, dx = rel[bi, i, j, 2 * kk], rel[bi, i, j, 2 * kk + 1]
                    py = i + base[kk, 0] + dy
                    px = j + base[kk, 1] + dx
                    s = _bilinear(feat[bi], py, px)
                    out[bi, i, j] += s @ weight[kk]
    return out.astype(np.float32)


def test_matches_oracle(rng):
    b, h, w, cin, cout = 2, 6, 7, 4, 3
    feat = rng.randn(b, h, w, cin).astype(np.float32)
    rel = (rng.randn(b, h, w, 18) * 2.0).astype(np.float32)
    weight = rng.randn(9, cin, cout).astype(np.float32) * 0.2
    got = np.asarray(
        deform_conv2d(jnp.asarray(feat), jnp.asarray(rel), jnp.asarray(weight))
    )
    expect = _dcn_oracle(feat, rel, weight)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_zero_offsets_is_plain_conv(rng):
    b, h, w, cin, cout = 1, 6, 6, 4, 3
    feat = rng.randn(b, h, w, cin).astype(np.float32)
    weight = rng.randn(9, cin, cout).astype(np.float32)
    got = np.asarray(
        deform_conv2d(
            jnp.asarray(feat), jnp.zeros((b, h, w, 18), jnp.float32),
            jnp.asarray(weight),
        )
    )
    t_in = torch.from_numpy(feat.transpose(0, 3, 1, 2))
    t_w = torch.from_numpy(
        weight.reshape(3, 3, cin, cout).transpose(3, 2, 0, 1).copy()
    )
    expect = torch.nn.functional.conv2d(t_in, t_w, padding=1)
    expect = expect.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_fused_gather_matches_4take_at_borders(rng):
    """The fused single-take gather must agree with the 4-take formulation
    everywhere, including every boundary case: corners straddling each
    edge (y0 or x0 == -1), patches fully outside, and huge coords."""
    from orientedreppoints_tpu.ops.deform_conv import (
        _bilinear_gather_fused, _bilinear_gather_4take,
    )

    b, h, w, c = 2, 5, 6, 3
    feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    # dense grid of positions covering [-2.5, h/w + 2.5] plus exact
    # integer boundary values (floor lands on -1, 0, h-1, h)
    ys = np.concatenate([
        np.linspace(-2.5, h + 2.5, 23),
        np.array([-1.0, -0.5, 0.0, h - 1.0, h - 0.5, float(h)]),
        np.array([-1e6, 1e6]),
    ])
    xs = np.concatenate([
        np.linspace(-2.5, w + 2.5, 23),
        np.array([-1.0, -0.5, 0.0, w - 1.0, w - 0.5, float(w)]),
        np.array([-1e6, 1e6]),
    ])
    py, px = np.meshgrid(ys, xs, indexing="ij")
    py = jnp.asarray(np.tile(py.reshape(1, -1), (b, 1)).astype(np.float32))
    px = jnp.asarray(np.tile(px.reshape(1, -1), (b, 1)).astype(np.float32))
    got = np.asarray(_bilinear_gather_fused(feat, py, px))
    expect = np.asarray(_bilinear_gather_4take(feat, py, px))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_base_offset_layout():
    base = dcn_base_offset(3).reshape(9, 2)
    # k row-major over (ky, kx): y slow, x fast
    assert base[0].tolist() == [-1, -1]
    assert base[1].tolist() == [-1, 0]
    assert base[3].tolist() == [0, -1]
    assert base[8].tolist() == [1, 1]


def test_pyramid_matches_per_level(rng):
    """deform_conv2d_pyramid == per-level deform_conv2d on a 3-level
    pyramid (same math, fused gather table)."""
    from orientedreppoints_tpu.ops.deform_conv import deform_conv2d_pyramid

    b, cin, cout = 2, 4, 3
    shapes = [(8, 9), (4, 5), (2, 3)]
    feats = [jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
             for h, w in shapes]
    offs = [jnp.asarray((rng.randn(b, h, w, 18) * 2).astype(np.float32))
            for h, w in shapes]
    weight = jnp.asarray(rng.randn(9, cin, cout).astype(np.float32) * 0.2)
    got = deform_conv2d_pyramid(feats, offs, weight)
    for lvl, (f, o) in enumerate(zip(feats, offs)):
        expect = deform_conv2d(f, o, weight)
        np.testing.assert_allclose(
            np.asarray(got[lvl]), np.asarray(expect), rtol=1e-4, atol=1e-4,
            err_msg=f"level {lvl}")


def test_pyramid_pair_forward_and_grads_match_autodiff(rng):
    """deform_conv2d_pyramid_pair (combined-scatter custom VJP) must equal
    autodiff of two independent deform_conv2d_pyramid instances sharing the
    same offsets — forward outputs AND grads wrt both feature pyramids,
    the shared offsets, and both weights (DESIGN.md s10)."""
    from orientedreppoints_tpu.ops.deform_conv import (
        deform_conv2d_pyramid, deform_conv2d_pyramid_pair,
    )

    b, cin, cout = 2, 4, 3
    shapes = [(8, 9), (4, 5), (2, 3)]
    feats_a = [jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
               for h, w in shapes]
    feats_b = [jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
               for h, w in shapes]
    offs = [jnp.asarray((rng.randn(b, h, w, 18) * 2).astype(np.float32))
            for h, w in shapes]
    w_a = jnp.asarray(rng.randn(9, cin, cout).astype(np.float32) * 0.2)
    w_b = jnp.asarray(rng.randn(9, cin, cout).astype(np.float32) * 0.2)
    # per-level cotangent-defining projections so every output matters
    proj = [jnp.asarray(rng.randn(b, h, w, cout).astype(np.float32))
            for h, w in shapes]

    def loss_pair(fa, fb, off, wa, wb):
        oa, ob = deform_conv2d_pyramid_pair(fa, fb, off, wa, wb)
        return sum((o * p).sum() for o, p in zip(oa, proj)) + sum(
            (o * p * 0.5).sum() for o, p in zip(ob, proj))

    def loss_ref(fa, fb, off, wa, wb):
        oa = deform_conv2d_pyramid(fa, off, wa)
        ob = deform_conv2d_pyramid(fb, off, wb)
        return sum((o * p).sum() for o, p in zip(oa, proj)) + sum(
            (o * p * 0.5).sum() for o, p in zip(ob, proj))

    args = (feats_a, feats_b, offs, w_a, w_b)
    np.testing.assert_allclose(
        float(loss_pair(*args)), float(loss_ref(*args)), rtol=1e-5)

    g_pair = jax.grad(loss_pair, argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for name, gp, gr in zip(
            ("feats_a", "feats_b", "offsets", "w_a", "w_b"), g_pair, g_ref):
        for i, (x, y) in enumerate(zip(
                jax.tree.leaves(gp), jax.tree.leaves(gr))):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=2e-4, atol=2e-4,
                err_msg=f"{name}[{i}]")


def test_pair_cat_gather_matches_narrow(rng, monkeypatch):
    """ORP_PAIR_GATHER=cat (4 channel-paired (N, 2C)-row takes) must be
    numerically identical to the 8-narrow-take default — forward outputs
    and all grads (the residuals feed the combined-scatter backward)."""
    from orientedreppoints_tpu.ops.deform_conv import (
        deform_conv2d_pyramid_pair,
    )

    b, cin, cout = 2, 3, 2
    shapes = [(6, 7), (3, 1), (1, 1)]
    feats_a = [jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
               for h, w in shapes]
    feats_b = [jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
               for h, w in shapes]
    offs = [jnp.asarray((rng.randn(b, h, w, 18) * 3).astype(np.float32))
            for h, w in shapes]
    w_a = jnp.asarray(rng.randn(9, cin, cout).astype(np.float32) * 0.2)
    w_b = jnp.asarray(rng.randn(9, cin, cout).astype(np.float32) * 0.2)
    proj = [jnp.asarray(rng.randn(b, h, w, cout).astype(np.float32))
            for h, w in shapes]

    def loss(fa, fb, off, wa, wb):
        oa, ob = deform_conv2d_pyramid_pair(fa, fb, off, wa, wb)
        return sum((o * p).sum() for o, p in zip(oa, proj)) + sum(
            (o * p * 0.7).sum() for o, p in zip(ob, proj))

    args = (feats_a, feats_b, offs, w_a, w_b)
    monkeypatch.setenv("ORP_PAIR_GATHER", "narrow")
    l_narrow = float(loss(*args))
    g_narrow = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
    monkeypatch.setenv("ORP_PAIR_GATHER", "cat")
    l_cat = float(loss(*args))
    g_cat = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
    np.testing.assert_allclose(l_cat, l_narrow, rtol=1e-6)
    for name, gn, gc in zip(
            ("feats_a", "feats_b", "offsets", "w_a", "w_b"),
            g_narrow, g_cat):
        for i, (x, y) in enumerate(zip(
                jax.tree.leaves(gn), jax.tree.leaves(gc))):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-6,
                err_msg=f"{name}[{i}]")


def test_pair_window_scatter_matches_combined(rng, monkeypatch):
    """ORP_PAIR_SCATTER=window (2 scatters of (N, 2, 2C) x-pair windows)
    must produce identical grads to the combined per-corner form,
    including degenerate w==1 levels and far-out-of-bounds offsets."""
    from orientedreppoints_tpu.ops.deform_conv import (
        deform_conv2d_pyramid_pair,
    )

    b, cin, cout = 2, 3, 2
    shapes = [(6, 7), (3, 1), (1, 1)]
    feats_a = [jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
               for h, w in shapes]
    feats_b = [jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
               for h, w in shapes]
    offs = [jnp.asarray((rng.randn(b, h, w, 18) * 3).astype(np.float32))
            for h, w in shapes]
    w_a = jnp.asarray(rng.randn(9, cin, cout).astype(np.float32) * 0.2)
    w_b = jnp.asarray(rng.randn(9, cin, cout).astype(np.float32) * 0.2)
    proj = [jnp.asarray(rng.randn(b, h, w, cout).astype(np.float32))
            for h, w in shapes]

    def loss(fa, fb, off, wa, wb):
        oa, ob = deform_conv2d_pyramid_pair(fa, fb, off, wa, wb)
        return sum((o * p).sum() for o, p in zip(oa, proj)) + sum(
            (o * p * 0.7).sum() for o, p in zip(ob, proj))

    args = (feats_a, feats_b, offs, w_a, w_b)
    monkeypatch.setenv("ORP_PAIR_SCATTER", "combined")
    g_comb = jax.grad(loss, argnums=(0, 1, 2))(*args)
    monkeypatch.setenv("ORP_PAIR_SCATTER", "window")
    g_win = jax.grad(loss, argnums=(0, 1, 2))(*args)
    for name, gc, gw in zip(("feats_a", "feats_b", "offsets"),
                            g_comb, g_win):
        for i, (x, y) in enumerate(zip(
                jax.tree.leaves(gc), jax.tree.leaves(gw))):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-6,
                err_msg=f"{name}[{i}]")
