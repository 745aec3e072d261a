"""Devkit tests: polygon IoU (native + numpy parity), ImgSplit, ResultMerge,
Task1/mAOE evaluators on synthetic data."""

import os
import os.path as osp

import cv2
import numpy as np
import pytest

from orientedreppoints_tpu.core.rbox import rbox2poly
from orientedreppoints_tpu.devkit import dota_utils as util
from orientedreppoints_tpu.devkit import polygon as pg
from orientedreppoints_tpu.devkit.evaluation import (
    eval_dota_task1,
    eval_maoe,
    voc_ap,
)
from orientedreppoints_tpu.devkit.img_split import (
    ImgSplit,
    best_point_order,
    reduce_poly5_to_poly4,
)
from orientedreppoints_tpu.devkit.result_merge import (
    merge_by_poly,
    write_task1_results,
)


def random_quads(rng, n, scale=80.0, offset=200.0):
    out = []
    for _ in range(n):
        cx, cy = rng.rand(2) * scale + offset
        w, h = rng.rand(2) * 40 + 10
        a = rng.rand() * np.pi
        c, s = np.cos(a), np.sin(a)
        r = np.array([[-w/2, -h/2], [w/2, -h/2], [w/2, h/2], [-w/2, h/2]])
        out.append(((r @ [[c, s], [-s, c]]) + [cx, cy]).reshape(-1))
    return np.array(out)


class TestPolygon:
    def test_iou_vs_cv2(self, rng):
        q1 = random_quads(rng, 10)
        q2 = random_quads(rng, 10)
        for i in range(10):
            for j in range(10):
                got = pg.poly_iou(q1[i], q2[j])
                h1 = cv2.convexHull(q1[i].reshape(4, 2).astype(np.float32))
                h2 = cv2.convexHull(q2[j].reshape(4, 2).astype(np.float32))
                inter, _ = cv2.intersectConvexConvex(h1, h2)
                a1, a2 = cv2.contourArea(h1), cv2.contourArea(h2)
                expect = inter / max(a1 + a2 - inter, 1e-9)
                assert got == pytest.approx(expect, abs=1e-4), (i, j)

    def test_native_matches_numpy(self, rng):
        if not pg._load_native():
            pytest.skip("native lib not built")
        q1 = random_quads(rng, 8)
        q2 = random_quads(rng, 8)
        m_native = pg.poly_iou_matrix(q1, q2)
        m_py = np.array([[pg.poly_iou(a, b) for b in q2] for a in q1])
        np.testing.assert_allclose(m_native, m_py, atol=1e-9)

    def test_poly_nms_suppresses_duplicates(self):
        base = np.array([0, 0, 20, 0, 20, 10, 0, 10], float)
        dets = np.stack([
            np.concatenate([base, [0.9]]),
            np.concatenate([base + 1, [0.8]]),   # heavy overlap -> dropped
            np.concatenate([base + 100, [0.7]]),  # far away -> kept
        ])
        keep = pg.poly_nms(dets, 0.1)
        assert keep == [0, 2]

    def test_clip_rect(self):
        poly = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
        clipped = pg.clip_polygon(poly, (5, 5, 20, 20))
        assert pg.polygon_area(clipped) == pytest.approx(25.0)


class TestImgSplitHelpers:
    def test_poly5_reduction(self):
        # pentagon with one very short edge between v1 and v2
        p5 = np.array([
            [0, 0], [10, 0], [10.5, 0.5], [10, 10], [0, 10]
        ], float)
        p4 = reduce_poly5_to_poly4(p5)
        assert p4.shape == (4, 2)
        # merged midpoint of the shortest edge must be a vertex
        mid = (p5[1] + p5[2]) / 2
        assert np.min(np.linalg.norm(p4 - mid, axis=1)) < 1e-9

    def test_best_point_order(self):
        ref = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
        rolled = np.roll(ref, -2, axis=0)
        fixed = best_point_order(rolled, ref)
        np.testing.assert_allclose(fixed, ref)


@pytest.fixture(scope="module")
def split_env(tmp_path_factory):
    """A synthetic 'DOTA' scene: 1500x1200 image with known gt boxes."""
    rng = np.random.RandomState(7)
    root = tmp_path_factory.mktemp("dota_raw")
    (root / "images").mkdir()
    (root / "labelTxt").mkdir()
    img = (rng.rand(1200, 1500, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(root / "images" / "P0001.png"), img)
    quads = random_quads(rng, 12, scale=1000.0, offset=100.0)
    objs = [
        dict(poly=q, name="plane" if i % 2 == 0 else "ship", difficult="0")
        for i, q in enumerate(quads)
    ]
    util.write_dota_poly(str(root / "labelTxt" / "P0001.txt"), objs)
    return str(root), quads


class TestImgSplit:
    def test_split_produces_patches(self, split_env, tmp_path):
        root, quads = split_env
        out = str(tmp_path / "split")
        s = ImgSplit(root, out, gap=200, subsize=512, num_process=1)
        s.splitdata(1.0)
        imgs = util.list_files(osp.join(out, "images"), ".png")
        labels = util.list_files(osp.join(out, "labelTxt"), ".txt")
        assert len(imgs) >= 4
        assert len(imgs) == len(labels)
        for p in imgs:
            im = cv2.imread(p)
            assert im.shape == (512, 512, 3)
        # every patch-gt poly is inside the patch bounds [0..512]
        total_objs = 0
        for lf in labels:
            for o in util.parse_dota_poly(lf):
                poly = np.asarray(o["poly"])
                assert poly.min() >= 0 and poly.max() <= 512
                total_objs += 1
        assert total_objs >= len(quads)  # overlap duplicates allowed

    def test_tile_naming(self, split_env, tmp_path):
        root, _ = split_env
        out = str(tmp_path / "split2")
        ImgSplit(root, out, gap=200, subsize=512, num_process=1).splitdata(1.0)
        name = util.basename_noext(
            util.list_files(osp.join(out, "images"), ".png")[0]
        )
        ori, rate, left, up = util.parse_tile_name(name)
        assert ori == "P0001" and rate == 1.0
        assert left % 312 == 0 or left == 1500 - 512
        assert up % 312 == 0 or up == 1200 - 512


class TestMergeAndEval:
    def test_roundtrip_eval_perfect_detections(self, split_env, tmp_path):
        """Detections == gt (in tile frames) must give mAP ~ 1 on used classes."""
        root, quads = split_env
        out = str(tmp_path / "split")
        ImgSplit(root, out, gap=200, subsize=512, num_process=1).splitdata(1.0)

        # build per-tile "detections" from the tile labels themselves
        results = {}
        for lf in util.list_files(osp.join(out, "labelTxt"), ".txt"):
            tile = util.basename_noext(lf)
            per_class = [np.zeros((0, 9))] * 15
            per_class = {i: [] for i in range(15)}
            for o in util.parse_dota_poly(lf):
                if o["difficult"] == "2":
                    continue
                ci = util.DOTA10_CLASSES.index(o["name"])
                per_class[ci].append(
                    np.concatenate([np.asarray(o["poly"]), [0.99]])
                )
            results[tile] = [
                np.stack(per_class[i]) if per_class[i] else np.zeros((0, 9))
                for i in range(15)
            ]
        raw_dir = str(tmp_path / "task1_raw")
        write_task1_results(results, util.DOTA10_CLASSES, raw_dir)
        merged_dir = str(tmp_path / "task1_merged")
        merge_by_poly(raw_dir, merged_dir, num_process=1)

        detpath = osp.join(merged_dir, "Task1_{:s}.txt")
        annopath = osp.join(root, "labelTxt", "{:s}.txt")
        used = sorted({o["name"] for o in util.parse_dota_poly(
            osp.join(root, "labelTxt", "P0001.txt"))})
        mAP, aps = eval_dota_task1(
            detpath, annopath, ["P0001"], classnames=used,
            use_07_metric=False,
        )
        assert mAP > 0.95, aps

        maoe, per_class = eval_maoe(detpath, annopath, ["P0001"],
                                    classnames=used)
        assert maoe < 5.0, per_class  # tile-clipping jitters angles slightly

        # mod90 companion: folded error <= scored error per class, and a
        # synthetic 89.5deg flip folds to 0.5 (min(e%90, 90-e%90))
        m, pc, m90, pc90 = eval_maoe(detpath, annopath, ["P0001"],
                                     classnames=used, return_mod90=True)
        assert m == maoe and pc == per_class
        for c, v in pc90.items():
            assert v <= pc[c] + 1e-9 and 0.0 <= v <= 45.0


class TestVocAp:
    def test_perfect_pr(self):
        rec = np.array([0.5, 1.0])
        prec = np.array([1.0, 1.0])
        assert voc_ap(rec, prec, use_07_metric=False) == pytest.approx(1.0)
        assert voc_ap(rec, prec, use_07_metric=True) == pytest.approx(1.0)
