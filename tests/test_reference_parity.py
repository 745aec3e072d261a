"""Differential parity: execute the reference's own pure-Python modules.

Unlike the rest of the suite (which re-derives semantics from SURVEY.md),
these tests importlib-load the reference code at /root/reference — treated
strictly as an UNTRUSTED TEST FIXTURE, loaded under import shims, never
placed on the library path — run it under torch CPU on shared random
fixtures, and assert our TPU-native implementations produce identical
outputs.

Covered reference surfaces:
  * PointAssigner.assign            (core/bbox/assigners/point_assigner.py:22-133)
  * sampling_points                 (anchor_heads/orientedreppoints_head.py:250-292)
  * point_samples_selection         (anchor_heads/orientedreppoints_head.py:602-671)
  * rbox2poly / poly2rbox / best-begin (core/bbox/transforms.py:401-509)
  * CorrectBox / RotateResize       (datasets/pipelines/transforms.py:43-200)
  * dota_evaluation_task1.voc_eval  (DOTA_devkit/dota_evaluation_task1.py:87)
  * init/refine_pointset_target     (core/bbox/pointset_target.py:6-230 —
    the full composites: assigner + PseudoSampler + unmap + images_to_levels)
  * SpatialBorderLoss               (models/losses/spatial_border_loss.py)
  * rbbox_flip / rbbox_mapping_back (core/bbox/transforms.py:273-301)

Shims (documented deliberate substitutions, not parity surfaces):
  * mmcv.imrescale/imresize are re-implemented faithfully over cv2 (mmcv is
    not installed); the parity surface is the reference's own poly scaling/
    clamping code, which runs verbatim.
  * the SWIG `polyiou` module is backed by our exact-polygon-IoU
    implementation (devkit/polygon.py, itself cv2/shapely-validated), so
    voc_eval parity exercises the reference's matching/AP logic.
"""

from __future__ import annotations

import importlib.util
import math
import os
import os.path as osp
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not osp.isdir(REF), reason="reference checkout not mounted"
)


def _load(fullname: str, path: str):
    spec = importlib.util.spec_from_file_location(fullname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


def _pkg(fullname: str, path: str | None = None):
    mod = types.ModuleType(fullname)
    mod.__path__ = [path] if path else []
    sys.modules[fullname] = mod
    return mod


def _restore_sys_modules(saved):
    """Surgical sys.modules restore for the shim fixtures.

    Drops modules added since `saved` whose ROOT package did not exist
    then (our stubs and importlib-loaded reference modules), keeps
    genuinely new submodules of real packages, and restores overwritten
    entries.  A blanket clear()+update(saved) purged lazily-imported jax
    internals (jax._src.pallas.*) at mid-module fixture teardown, and the
    next in-test `from .pallas_minarearect import ...` re-import then
    crashed against the stale jax parent."""
    for k in list(sys.modules):
        if k not in saved and k.split(".", 1)[0] not in saved:
            del sys.modules[k]
    for k, v in saved.items():
        if sys.modules.get(k) is not v:
            sys.modules[k] = v


@pytest.fixture(scope="class")
def ref_point_assigner():
    """Load the reference PointAssigner with its real AssignResult.

    Class-scoped (like ref_pointset_target) so the torch.Tensor.cuda
    patch and sys.modules stubs are torn down right after the class that
    needs them, not at module end (advisor round-3 finding)."""
    saved = dict(sys.modules)
    saved_cuda = torch.Tensor.cuda
    try:
        # assign_result.py:45 calls .cuda() unconditionally; run it on CPU
        torch.Tensor.cuda = lambda self, *a, **k: self
        # assign_result.py needs mmdet.utils.util_mixins.NiceRepr
        _pkg("mmdet", None)
        utils = _pkg("mmdet.utils", None)
        um = types.ModuleType("mmdet.utils.util_mixins")
        um.NiceRepr = object
        sys.modules["mmdet.utils.util_mixins"] = um
        utils.util_mixins = um

        base = osp.join(REF, "mmdet/core/bbox/assigners")
        _pkg("refassign", base)
        _load("refassign.assign_result", osp.join(base, "assign_result.py"))
        _load("refassign.base_assigner", osp.join(base, "base_assigner.py"))
        mod = _load("refassign.point_assigner",
                    osp.join(base, "point_assigner.py"))
        yield mod
    finally:
        torch.Tensor.cuda = saved_cuda
        _restore_sys_modules(saved)


@pytest.fixture(scope="module")
def ref_head():
    """Load the reference head module with stubbed heavy deps; only the
    pure-torch methods (sampling_points / point_samples_selection) are
    exercised, via an unbound call on a namespace standing in for self."""
    saved = dict(sys.modules)
    try:
        def stub(name, **attrs):
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
            return m

        class _Any:
            def __init__(self, *a, **k):
                pass

            def __call__(self, *a, **k):
                return None

        stub("mmcv")
        stub("mmcv.cnn", normal_init=_Any(), constant_init=_Any())
        core = stub(
            "mmdet.core", PointGenerator=_Any, multi_apply=_Any(),
            multiclass_rnms=_Any(), levels_to_images=_Any(),
        )
        stub("mmdet", core=core)
        stub("mmdet.ops", ConvModule=_Any, DeformConv=_Any)
        stub("mmdet.core.bbox", init_pointset_target=_Any(),
             refine_pointset_target=_Any())
        stub("mmdet.ops.minarearect", minaerarect=_Any())
        stub("mmdet.ops.chamfer_distance", ChamferDistance2D=_Any)

        # the head does `from ..builder import build_loss` etc. — fake the
        # package chain refmodels.anchor_heads.<module>
        _pkg("refmodels", None)
        stub("refmodels.builder", build_loss=_Any())

        class _Registry:
            def register_module(self, cls):
                return cls

        stub("refmodels.registry", HEADS=_Registry())
        stub("refmodels.utils",
             bias_init_with_prob=lambda p: float(-np.log((1 - p) / p)))
        _pkg("refmodels.anchor_heads",
             osp.join(REF, "mmdet/models/anchor_heads"))
        mod = _load(
            "refmodels.anchor_heads.orientedreppoints_head",
            osp.join(REF, "mmdet/models/anchor_heads/"
                          "orientedreppoints_head.py"),
        )
        yield mod
    finally:
        _restore_sys_modules(saved)


def _grid_points(img, strides):
    """(N, 3) multi-level (x, y, stride) rows + per-level counts."""
    from orientedreppoints_tpu.core import points as P
    import jax.numpy as jnp

    pts = [np.asarray(P.grid_points(img // s, img // s, s))
           for s in strides]
    counts = [p.shape[0] for p in pts]
    return np.concatenate(pts, axis=0), counts


def _random_gts(rng, g, img):
    polys = np.zeros((g, 8), np.float32)
    for j in range(g):
        cx, cy = rng.rand(2) * (img * 0.8) + img * 0.1
        w, h = rng.rand(2) * (img * 0.4) + 6
        a = rng.rand() * np.pi
        c, s = np.cos(a), np.sin(a)
        r = np.array([[-w / 2, -h / 2], [w / 2, -h / 2],
                      [w / 2, h / 2], [-w / 2, h / 2]])
        polys[j] = ((r @ [[c, s], [-s, c]]) + [cx, cy]).reshape(-1)
    return polys


class TestPointAssignerParity:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("pos_num", [1, 2])
    def test_assign_matches_reference(self, ref_point_assigner, seed,
                                      pos_num):
        import jax.numpy as jnp
        from orientedreppoints_tpu.core.assigners import point_assign

        rng = np.random.RandomState(seed)
        img, strides = 256, [8, 16, 32, 64, 128]
        points, _ = _grid_points(img, strides)
        gts = _random_gts(rng, 9, img)

        ref = ref_point_assigner.PointAssigner(scale=4, pos_num=pos_num)
        res = ref.assign(torch.from_numpy(points),
                         torch.from_numpy(gts))
        want = res.gt_inds.numpy()

        got = np.asarray(point_assign(
            jnp.asarray(points), jnp.ones((points.shape[0],), bool),
            jnp.asarray(gts), jnp.ones((gts.shape[0],), bool),
            scale=4.0, pos_num=pos_num,
        ))
        np.testing.assert_array_equal(got, want)


class TestSamplingPointsParity:
    @pytest.mark.parametrize("seed", [0, 3])
    def test_edge_points_match(self, ref_head, seed):
        import jax.numpy as jnp
        from orientedreppoints_tpu.core.apaa import sample_edge_points

        rng = np.random.RandomState(seed)
        quads = _random_gts(rng, 16, 512)
        ns = types.SimpleNamespace()
        want = ref_head.OrientedRepPointsHead.sampling_points(
            ns, torch.from_numpy(quads), 10
        ).numpy()  # (N, 40, 2)
        got = np.asarray(sample_edge_points(jnp.asarray(quads),
                                            points_per_edge=10))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


class TestSampleSelectionParity:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_selection_matches_reference(self, ref_head, seed):
        import jax.numpy as jnp
        from orientedreppoints_tpu.core.apaa import (
            compact_positives, sample_selection,
        )

        rng = np.random.RandomState(seed)
        strides = [8, 16, 32, 64, 128]
        img = 256
        counts = [(img // s) ** 2 for s in strides]
        n = sum(counts)
        num_gt = 5

        # random sparse positive assignment over the point grid
        gt_inds = np.zeros((n,), np.int64)
        n_pos = rng.randint(20, 60)
        pos_idx = rng.choice(n, size=n_pos, replace=False)
        gt_inds[pos_idx] = rng.randint(1, num_gt + 1, size=n_pos)
        quality_full = rng.rand(n).astype(np.float32) * 5

        pos_inds = np.nonzero(gt_inds)[0]
        pos_gt_inds = gt_inds[pos_inds]
        label = np.zeros((n,), np.int64)
        label[pos_inds] = rng.randint(1, 16, size=len(pos_inds))
        label_weight = np.ones((n,), np.float32)
        rbox_weight = np.zeros((n,), np.float32)
        rbox_weight[pos_inds] = 1.0

        ns = types.SimpleNamespace(
            top_ratio=0.4, point_base_scale=2, point_strides=strides
        )
        (r_label, r_label_w, r_rbox_w, r_num_pos,
         r_norm) = ref_head.OrientedRepPointsHead.point_samples_selection(
            ns,
            torch.from_numpy(quality_full[pos_inds]).float(),
            torch.from_numpy(label.copy()),
            torch.from_numpy(label_weight.copy()),
            torch.from_numpy(rbox_weight.copy()),
            torch.from_numpy(pos_inds),
            torch.from_numpy(pos_gt_inds),
            num_proposals_each_level=list(counts),
            num_level=len(strides),
        )
        kept_ref = pos_inds[np.isin(pos_inds,
                                    pos_inds[r_rbox_w[pos_inds] > 0])]
        kept_ref = np.sort(pos_inds[(r_rbox_w.numpy()[pos_inds] > 0)])
        norm_ref = {}
        # reference returns pos_normalize_term aligned with its (per-gt
        # concatenated) pos_inds_after_select; recover the kept order
        # independently to build the ind->norm mapping
        sel = np.sort(kept_ref)
        level_of = np.concatenate(
            [np.full((c,), li) for li, c in enumerate(counts)])
        for i in sel:
            norm_ref[int(i)] = 2 * strides[level_of[i]]

        # ours: fixed-capacity candidates + keep mask
        level_ids = jnp.asarray(level_of)
        cand = compact_positives(jnp.asarray(gt_inds), level_ids,
                                 max_pos=128)
        cand_np = np.asarray(cand.idx)
        q_cand = jnp.asarray(quality_full[cand_np])
        keep = np.asarray(sample_selection(
            cand, q_cand, num_gt, len(strides),
            per_level_topk=6, top_ratio=0.4,
        ))
        kept_ours = np.sort(cand_np[keep])

        np.testing.assert_array_equal(kept_ours, kept_ref)
        assert int(r_num_pos) == len(kept_ours)
        # demoted positives: label zeroed, rbox weight zeroed, label
        # weight NOT zeroed (ignore set always empty — head :651-656)
        demoted = np.setdiff1d(pos_inds, kept_ref)
        assert (r_label.numpy()[demoted] == 0).all()
        assert (r_label_w.numpy()[demoted] == 1).all()
        # normalize term parity (per kept positive)
        norm_ours = {
            int(g): float(2 * strides[int(l)])
            for g, l, k in zip(cand_np, np.asarray(cand.level), keep) if k
        }
        r_norm = r_norm.numpy()
        assert len(r_norm) == len(kept_ref)
        # reference terms are per kept ind (per-gt order); compare as
        # multisets keyed by ind via the independent level mapping
        assert norm_ours == norm_ref


class TestRboxTransformParity:
    def _load_transforms(self):
        saved = dict(sys.modules)
        sys.modules["mmcv"] = types.ModuleType("mmcv")
        try:
            return _load("reftransforms",
                         osp.join(REF, "mmdet/core/bbox/transforms.py")), saved
        except BaseException:
            _restore_sys_modules(saved)
            raise

    def test_rbox2poly_poly2rbox_best_begin(self):
        mod, saved = self._load_transforms()
        # the reference uses the long-removed np.float alias
        # (transforms.py:452 etc.) — restore it for the duration
        had_float = hasattr(np, "float")
        if not had_float:
            np.float = float  # noqa: NPY001
        try:
            from orientedreppoints_tpu.core.rbox import (
                get_best_begin_point, poly2rbox, rbox2poly,
            )

            rng = np.random.RandomState(0)
            # rboxes: x, y, w, h, angle in [-pi/4, 3pi/4)
            n = 64
            rb = np.stack([
                rng.rand(n) * 800 + 100,
                rng.rand(n) * 800 + 100,
                rng.rand(n) * 120 + 30,
                rng.rand(n) * 60 + 10,
                rng.rand(n) * np.pi - np.pi / 4,
            ], axis=1).astype(np.float64)

            want_poly = np.asarray(mod.rbox2poly(rb))
            got_poly = rbox2poly(rb)
            np.testing.assert_allclose(got_poly, want_poly, rtol=1e-6,
                                       atol=1e-3)

            polys = _random_gts(rng, 64, 1024).astype(np.float64)
            want_rb = np.asarray(mod.poly2rbox(polys))
            got_rb = poly2rbox(polys)
            np.testing.assert_allclose(got_rb, want_rb, rtol=1e-5,
                                       atol=1e-3)

            want_bb = np.asarray(mod.get_best_begin_point(polys))
            got_bb = get_best_begin_point(polys)
            np.testing.assert_allclose(got_bb, want_bb, rtol=1e-6,
                                       atol=1e-3)
        finally:
            if not had_float:
                del np.float
            _restore_sys_modules(saved)


def _mmcv_shim():
    """Minimal faithful mmcv image API over cv2 (mmcv.imrescale semantics:
    scale_factor = min(max_long/long, max_short/short); sizes rounded via
    int(x * f + 0.5))."""
    m = types.ModuleType("mmcv")

    def is_list_of(seq, typ):
        return isinstance(seq, list) and all(
            isinstance(s, typ) for s in seq)

    def imresize(img, size, return_scale=False):
        h, w = img.shape[:2]
        out = cv2.resize(img, size, interpolation=cv2.INTER_LINEAR)
        if not return_scale:
            return out
        return out, size[0] / w, size[1] / h

    def _scale_size(size, f):
        w, h = size
        return int(w * f + 0.5), int(h * f + 0.5)

    def imrescale(img, scale, return_scale=False):
        h, w = img.shape[:2]
        if isinstance(scale, (float, int)):
            f = scale
        else:
            max_long, max_short = max(scale), min(scale)
            f = min(max_long / max(h, w), max_short / min(h, w))
        new_size = _scale_size((w, h), f)
        out = cv2.resize(img, new_size, interpolation=cv2.INTER_LINEAR)
        if not return_scale:
            return out
        return out, f

    m.is_list_of = is_list_of
    m.imresize = imresize
    m.imrescale = imrescale
    return m


@pytest.fixture(scope="module")
def ref_pipelines():
    saved = dict(sys.modules)
    try:
        sys.modules["mmcv"] = _mmcv_shim()
        _pkg("mmdet", None)
        _pkg("mmdet.core", None)
        _pkg("mmdet.core.evaluation", None)
        bo = types.ModuleType("mmdet.core.evaluation.bbox_overlaps")
        bo.bbox_overlaps = lambda *a, **k: None
        sys.modules["mmdet.core.evaluation.bbox_overlaps"] = bo
        sys.modules["mmdet.core.evaluation"].bbox_overlaps = bo.bbox_overlaps

        _pkg("refpipe", None)

        class _Registry:
            # the reference uses both @register_module and
            # @register_module() decorator forms
            def register_module(self, cls=None):
                if cls is None:
                    return lambda c: c
                return cls

        reg = types.ModuleType("refpipe.registry")
        reg.PIPELINES = _Registry()
        sys.modules["refpipe.registry"] = reg
        _pkg("refpipe.pipelines", osp.join(REF, "mmdet/datasets/pipelines"))
        mod = _load("refpipe.pipelines.transforms",
                    osp.join(REF, "mmdet/datasets/pipelines/transforms.py"))
        yield mod
    finally:
        _restore_sys_modules(saved)


class TestPipelineParity:
    def test_correct_box(self, ref_pipelines):
        from orientedreppoints_tpu.data.pipelines import CorrectBox

        rng = np.random.RandomState(1)
        polys = _random_gts(rng, 24, 512).astype(np.float32)
        ref = ref_pipelines.CorrectBox(correct_rbbox=True, refine_rbbox=True)
        want = ref({"gt_bboxes": polys.copy()})["gt_bboxes"]
        ours = CorrectBox(correct_rbbox=True, refine_rbbox=True)
        got = ours({"gt_bboxes": polys.copy()})["gt_bboxes"]
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_rotate_resize_fixed_scale(self, ref_pipelines):
        from orientedreppoints_tpu.data.pipelines import RotateResize

        rng = np.random.RandomState(2)
        img = (rng.rand(200, 300, 3) * 255).astype(np.uint8)
        polys = _random_gts(rng, 12, 200).astype(np.float32)

        def mk():
            return {
                "img": img.copy(),
                "img_shape": img.shape,
                "gt_bboxes": polys.copy(),
                "bbox_fields": ["gt_bboxes"],
            }

        ref = ref_pipelines.RotateResize(
            img_scale=[(512, 384)], keep_ratio=True, clamp_rbbox=True)
        want = ref(mk())
        ours = RotateResize(
            img_scale=(512, 384), keep_ratio=True, clamp_rbbox=True)
        got = ours(mk())
        assert got["img"].shape == want["img"].shape
        np.testing.assert_allclose(
            np.asarray(got["scale_factor"], np.float64).ravel()[0],
            np.asarray(want["scale_factor"], np.float64).ravel()[0],
            rtol=1e-6,
        )
        np.testing.assert_allclose(got["gt_bboxes"], want["gt_bboxes"],
                                   rtol=1e-5, atol=1e-3)
        np.testing.assert_array_equal(got["img"], want["img"])


@pytest.fixture(scope="module")
def ref_voc_eval():
    saved = dict(sys.modules)
    try:
        from orientedreppoints_tpu.devkit.polygon import poly_iou

        pio = types.ModuleType("polyiou")
        pio.VectorDouble = lambda x: np.asarray(x, np.float64)
        pio.iou_poly = lambda a, b: float(poly_iou(np.asarray(a),
                                                   np.asarray(b)))
        sys.modules["polyiou"] = pio
        mod = _load("refeval",
                    osp.join(REF, "DOTA_devkit/dota_evaluation_task1.py"))
        yield mod
    finally:
        _restore_sys_modules(saved)


class TestVocEvalParity:
    def _make_dataset(self, tmp_path, rng):
        """Synthetic 2-class detections+annotations over 4 images."""
        classes = ["plane", "ship"]
        images = [f"P{i:04d}" for i in range(4)]
        ann_dir = tmp_path / "anno"
        det_dir = tmp_path / "det"
        ann_dir.mkdir()
        det_dir.mkdir()
        gt_store = {}
        for name in images:
            lines = []
            polys = _random_gts(rng, 6, 800)
            for j, p in enumerate(polys):
                cls = classes[j % 2]
                diff = 1 if j == 5 else 0
                lines.append(" ".join(f"{v:.1f}" for v in p)
                             + f" {cls} {diff}")
                gt_store.setdefault((name, cls), []).append(p)
            (ann_dir / f"{name}.txt").write_text("\n".join(lines) + "\n")
        for cls in classes:
            lines = []
            for name in images:
                for p in gt_store.get((name, cls), []):
                    # jittered detection + random score
                    q = p + rng.randn(8) * 6
                    sc = rng.rand() * 0.9 + 0.05
                    lines.append(
                        f"{name} {sc:.4f} "
                        + " ".join(f"{v:.2f}" for v in q))
                # a false positive
                fp = _random_gts(rng, 1, 800)[0]
                lines.append(f"{name} {rng.rand():.4f} "
                             + " ".join(f"{v:.2f}" for v in fp))
            (det_dir / f"Task1_{cls}.txt").write_text(
                "\n".join(lines) + "\n")
        (tmp_path / "images.txt").write_text(
            "\n".join(images) + "\n")
        return classes, images, str(ann_dir), str(det_dir)

    def test_voc_eval_matches_reference(self, ref_voc_eval, tmp_path):
        from orientedreppoints_tpu.devkit.evaluation import voc_eval_poly

        rng = np.random.RandomState(7)
        classes, images, ann_dir, det_dir = self._make_dataset(
            tmp_path, rng)
        detpath = osp.join(det_dir, "Task1_{:s}.txt")
        annopath = osp.join(ann_dir, "{:s}.txt")
        imagesetfile = str(tmp_path / "images.txt")

        for cls in classes:
            rec_r, prec_r, ap_r = ref_voc_eval.voc_eval(
                detpath, annopath, imagesetfile, cls,
                ovthresh=0.5, use_07_metric=False)
            rec_o, prec_o, ap_o = voc_eval_poly(
                detpath, annopath, images, cls,
                ovthresh=0.5, use_07_metric=False)
            assert abs(ap_o - ap_r) < 1e-9, (cls, ap_o, ap_r)
            np.testing.assert_allclose(rec_o, rec_r, atol=1e-12)
            np.testing.assert_allclose(prec_o, prec_r, atol=1e-12)


# ---------------------------------------------------------------------------
# Backbone feature-map parity: run the reference's own backbone modules
# (torch CPU) with random weights, convert those exact weights through
# utils/checkpoint.py, and assert our NHWC feature maps match per stage.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_resnet():
    saved = dict(sys.modules)
    try:
        import torch.nn as nn

        def stub(name, **attrs):
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
            return m

        def build_norm_layer(cfg, num_features, postfix=""):
            # faithful minimal mmdet.ops.build_norm_layer for type=BN
            assert cfg["type"] == "BN"
            return f"bn{postfix}", nn.BatchNorm2d(num_features)

        def build_conv_layer(cfg, *args, **kwargs):
            assert cfg is None
            return nn.Conv2d(*args, **kwargs)

        stub("mmcv")
        stub("mmcv.cnn", constant_init=lambda *a, **k: None,
             kaiming_init=lambda *a, **k: None)
        stub("mmcv.runner", load_checkpoint=lambda *a, **k: None)
        stub("mmdet")
        stub("mmdet.ops", ContextBlock=object, GeneralizedAttention=object,
             build_conv_layer=build_conv_layer,
             build_norm_layer=build_norm_layer)
        import logging
        stub("mmdet.utils", get_root_logger=lambda: logging.getLogger("t"))
        _pkg("refbackbones", None)

        class _Registry:
            def register_module(self, cls=None):
                if cls is None:
                    return lambda c: c
                return cls

        stub("refbackbones.registry", BACKBONES=_Registry())
        _pkg("refbackbones.models",
             osp.join(REF, "mmdet/models/backbones"))
        sys.modules["refbackbones.models"].registry = sys.modules[
            "refbackbones.registry"]
        # resnet.py does `from ..registry import BACKBONES` relative to
        # refbackbones.models.<mod>; alias the registry there
        sys.modules["refbackbones.registry"].__name__ = (
            "refbackbones.registry")
        mod = _load("refbackbones.models.resnet",
                    osp.join(REF, "mmdet/models/backbones/resnet.py"))
        yield mod
    finally:
        _restore_sys_modules(saved)


def _randomize_state_dict(net, rng):
    sd = net.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if "running_var" in k or k.endswith("weight") and v.ndim == 1:
                sd[k] = torch.from_numpy(
                    (rng.rand(*v.shape) * 0.8 + 0.4).astype(np.float32))
            else:
                sd[k] = torch.from_numpy(
                    (rng.randn(*v.shape) * 0.05).astype(np.float32))
    net.load_state_dict(sd)
    return {k: np.asarray(v) for k, v in sd.items()}


class TestResNetFeatureParity:
    def test_r50_stage_outputs_match(self, ref_resnet):
        import jax
        import jax.numpy as jnp
        from orientedreppoints_tpu.models import ResNet
        from orientedreppoints_tpu.utils.checkpoint import (
            convert_torchvision_resnet,
        )

        rng = np.random.RandomState(0)
        net = ref_resnet.ResNet(
            depth=50, num_stages=4, out_indices=(0, 1, 2, 3),
            frozen_stages=-1, style="pytorch",
        )
        sd = _randomize_state_dict(net, rng)
        net.eval()
        x = rng.rand(1, 3, 96, 96).astype(np.float32)
        with torch.no_grad():
            want = [o.numpy() for o in net(torch.from_numpy(x))]

        params, stats = convert_torchvision_resnet(sd, 50)
        model = ResNet(depth=50)
        got = jax.jit(model.apply)(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
        )
        assert len(got) == len(want) == 4
        for i, (g, w) in enumerate(zip(got, want)):
            np.testing.assert_allclose(
                np.asarray(g), w.transpose(0, 2, 3, 1),
                rtol=1e-4, atol=1e-4, err_msg=f"stage {i}")


@pytest.fixture(scope="module")
def ref_swin():
    saved = dict(sys.modules)
    try:
        import torch.nn as nn

        def stub(name, **attrs):
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
            return m

        class DropPath(nn.Module):
            # timm DropPath; parity tests run in eval mode -> identity
            def __init__(self, drop_prob=None):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):
                if not self.training or not self.drop_prob:
                    return x
                keep = 1 - self.drop_prob
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = x.new_empty(shape).bernoulli_(keep)
                return x / keep * mask

        stub("timm")
        stub("timm.models")
        stub("timm.models.layers", DropPath=DropPath,
             to_2tuple=lambda v: v if isinstance(v, tuple) else (v, v),
             trunc_normal_=torch.nn.init.trunc_normal_)
        stub("mmcv_custom", load_checkpoint=lambda *a, **k: None)
        import logging
        stub("mmdet")
        stub("mmdet.utils", get_root_logger=lambda: logging.getLogger("t"))
        _pkg("refswin", None)

        class _Registry:
            def register_module(self, cls=None):
                if cls is None:
                    return lambda c: c
                return cls

        stub("refswin.registry", BACKBONES=_Registry())
        _pkg("refswin.models", osp.join(REF, "mmdet/models/backbones"))
        mod = _load("refswin.models.swin_transformer",
                    osp.join(REF, "mmdet/models/backbones/"
                                  "swin_transformer.py"))
        yield mod
    finally:
        _restore_sys_modules(saved)


class TestSwinFeatureParity:
    def test_swin_tiny_stage_outputs_match(self, ref_swin):
        import jax
        import jax.numpy as jnp
        from orientedreppoints_tpu.models.swin import SwinTransformer
        from orientedreppoints_tpu.utils.checkpoint import convert_swin_tiny

        rng = np.random.RandomState(1)
        net = ref_swin.SwinTransformer(
            embed_dim=96, depths=[2, 2, 6, 2], num_heads=[3, 6, 12, 24],
            window_size=7, ape=False, drop_path_rate=0.0,
            out_indices=(1, 2, 3), frozen_stages=-1,
        )
        sd = net.state_dict()
        for k, v in sd.items():
            if not v.dtype.is_floating_point:
                continue  # relative_position_index etc.
            if "relative_position_bias_table" in k:
                sd[k] = torch.from_numpy(
                    (rng.randn(*v.shape) * 0.05).astype(np.float32))
            elif k.endswith("weight") and v.ndim == 1:  # LN scales
                sd[k] = torch.from_numpy(
                    (rng.rand(*v.shape) * 0.6 + 0.7).astype(np.float32))
            else:
                sd[k] = torch.from_numpy(
                    (rng.randn(*v.shape) * 0.04).astype(np.float32))
        net.load_state_dict(sd)
        net.eval()
        x = rng.rand(1, 3, 224, 224).astype(np.float32)
        with torch.no_grad():
            want = [o.numpy() for o in net(torch.from_numpy(x))]

        params = convert_swin_tiny(
            {k: np.asarray(v) for k, v in sd.items()})
        model = SwinTransformer()
        got = jax.jit(lambda p, a: model.apply(p, a, deterministic=True))(
            {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
        assert len(got) == len(want) == 3
        for i, (g, w) in enumerate(zip(got, want)):
            np.testing.assert_allclose(
                np.asarray(g), w.transpose(0, 2, 3, 1),
                rtol=2e-3, atol=2e-3, err_msg=f"stage {i}")


@pytest.fixture(scope="module")
def ref_ucas_eval():
    saved = dict(sys.modules)
    try:
        from orientedreppoints_tpu.devkit.polygon import poly_iou

        pio = types.ModuleType("polyiou")
        pio.VectorDouble = lambda x: np.asarray(x, np.float64)
        pio.iou_poly = lambda a, b: float(poly_iou(np.asarray(a),
                                                   np.asarray(b)))
        sys.modules["polyiou"] = pio
        had_bool = hasattr(np, "bool")
        if not had_bool:
            np.bool = bool  # removed alias used at ucasaod_evaluation.py:151
        try:
            mod = _load("refucas",
                        osp.join(REF, "DOTA_devkit/ucasaod_evaluation.py"))
            yield mod
        finally:
            if not had_bool:
                del np.bool
    finally:
        _restore_sys_modules(saved)


class TestUcasAodEvalParity:
    def test_eval_matches_reference(self, ref_ucas_eval, tmp_path):
        """Run the reference's own ucasaod_evaluation.voc_eval (car/airplane,
        IoU 0.7, VOC-07 as in its main()) against our eval_ucasaod on a
        synthetic UCAS-AOD-format dataset."""
        from orientedreppoints_tpu.devkit.evaluation import eval_ucasaod

        rng = np.random.RandomState(11)
        classes = ["car", "airplane"]
        images = [f"U{i:04d}" for i in range(3)]
        ann_dir = tmp_path / "anno"
        det_dir = tmp_path / "det"
        ann_dir.mkdir()
        det_dir.mkdir()
        store = {}
        for name in images:
            lines = []
            polys = _random_gts(rng, 6, 600)
            for j, p in enumerate(polys):
                cls = classes[j % 2]
                lines.append(" ".join(f"{v:.1f}" for v in p) + f" {cls} 0")
                store.setdefault((name, cls), []).append(p)
            (ann_dir / f"{name}.txt").write_text("\n".join(lines) + "\n")
        for cls in classes:
            lines = []
            for name in images:
                for p in store.get((name, cls), []):
                    q = p + rng.randn(8) * 4
                    lines.append(f"{name} {rng.rand():.4f} "
                                 + " ".join(f"{v:.2f}" for v in q))
            (det_dir / f"Task1_{cls}.txt").write_text(
                "\n".join(lines) + "\n")
        (tmp_path / "images.txt").write_text("\n".join(images) + "\n")

        detpath = osp.join(str(det_dir), "Task1_{:s}.txt")
        annopath = osp.join(str(ann_dir), "{:s}.txt")
        want = {}
        for cls in classes:
            _, _, ap = ref_ucas_eval.voc_eval(
                detpath, annopath, str(tmp_path / "images.txt"), cls,
                ovthresh=0.7, use_07_metric=True)
            want[cls] = ap
        mAP, aps = eval_ucasaod(detpath, annopath, images)
        for cls in classes:
            assert abs(aps[cls] - want[cls]) < 1e-12, (cls, aps, want)
        assert abs(mAP - np.mean(list(want.values()))) < 1e-12


@pytest.fixture(scope="module")
def ref_maoe():
    saved = dict(sys.modules)
    try:
        from orientedreppoints_tpu.devkit.polygon import poly_iou

        pio = types.ModuleType("polyiou")
        pio.VectorDouble = lambda x: np.asarray(x, np.float64)
        pio.iou_poly = lambda a, b: float(poly_iou(np.asarray(a),
                                                   np.asarray(b)))
        sys.modules["polyiou"] = pio
        missing = [a for a in ("bool", "float") if not hasattr(np, a)]
        for a in missing:
            setattr(np, a, getattr(__builtins__, a, {"bool": bool,
                                                     "float": float}[a]))
        try:
            _load("refpoly2rbox",
                  osp.join(REF, "DOTA_devkit/dota_poly2rbox.py"))
            sys.modules["dota_poly2rbox"] = sys.modules["refpoly2rbox"]
            mod = _load("refmaoe",
                        osp.join(REF, "DOTA_devkit/mAOE_evaluation.py"))
            yield mod
        finally:
            for a in missing:
                delattr(np, a)
    finally:
        _restore_sys_modules(saved)


class TestMaoeParity:
    def test_maoe_matches_reference(self, ref_maoe, tmp_path):
        """Execute the reference's own mAOE evaluator (no gt dedup, no
        angle wrap, 57.32 factor, IoU 0.7 as its main() uses) vs ours,
        including duplicate detections on one gt and a near-square box
        whose longest edge flips (the ~90deg tail)."""
        from orientedreppoints_tpu.devkit.evaluation import eval_maoe

        rng = np.random.RandomState(5)
        classes = ["plane"]
        images = ["P0000", "P0001"]
        ann_dir = tmp_path / "anno"
        det_dir = tmp_path / "det"
        ann_dir.mkdir()
        det_dir.mkdir()
        det_lines = []
        for name in images:
            lines = []
            polys = _random_gts(rng, 5, 600)
            # one near-square gt to exercise the longest-edge flip
            sq = np.array([100, 100, 160, 102, 158, 162, 98, 160],
                          np.float64)
            polys = np.vstack([polys, sq[None]])
            for p in polys:
                lines.append(" ".join(f"{v:.1f}" for v in p) + " plane 0")
                # two detections per gt (dedup difference would show)
                for _ in range(2):
                    q = p + rng.randn(8) * 3
                    det_lines.append(
                        f"{name} {rng.rand():.4f} "
                        + " ".join(f"{v:.2f}" for v in q))
            (ann_dir / f"{name}.txt").write_text("\n".join(lines) + "\n")
        (det_dir / "Task1_plane.txt").write_text(
            "\n".join(det_lines) + "\n")
        (tmp_path / "images.txt").write_text("\n".join(images) + "\n")

        detpath = osp.join(str(det_dir), "Task1_{:s}.txt")
        annopath = osp.join(str(ann_dir), "{:s}.txt")
        want = ref_maoe.aoe_eval(
            detpath, annopath, str(tmp_path / "images.txt"), "plane",
            ovthresh=0.7)
        want_mean = float(np.mean(want))
        got, per_class = eval_maoe(detpath, annopath, images,
                                   classnames=classes, ovthresh=0.7)
        # the reference mixes float32 casts with float64 arctan2; ~1e-6
        # deg differences remain
        assert abs(got - want_mean) < 1e-4, (got, want_mean)
        assert len(want) > 6  # duplicates contributed (no dedup)


class TestMaxIoUAssignerParity:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_assign_wrt_overlaps_matches_reference(self, ref_point_assigner,
                                                   seed):
        """The 4-step assign rule on a SHARED random (G, N) IoU matrix:
        reference MaxIoUAssigner.assign_wrt_overlaps (torch, executed from
        max_iou_assigner.py with gt_max_assign_all) vs our
        max_iou_assign_from_overlaps — including engineered ties where two
        proposals share a gt's max IoU and two gts share a proposal."""
        import importlib

        # load max_iou_assigner into the same synthetic package the
        # point-assigner fixture installed (shares AssignResult); stub the
        # CUDA convex_overlaps import (we test the matrix-level rule)
        ops = types.ModuleType("mmdet.ops")
        iou = types.ModuleType("mmdet.ops.iou")
        iou.convex_overlaps = lambda *a, **k: None
        sys.modules["mmdet.ops"] = ops
        sys.modules["mmdet.ops.iou"] = iou
        mod = _load(
            "refassign.max_iou_assigner",
            osp.join(REF, "mmdet/core/bbox/assigners/max_iou_assigner.py"),
        )
        import jax.numpy as jnp
        from orientedreppoints_tpu.core.assigners import (
            max_iou_assign_from_overlaps,
        )

        rng = np.random.RandomState(seed)
        g, n = 7, 200
        overlaps = (rng.rand(g, n) * 0.4).astype(np.float32)
        # engineered ties: proposals 0 and 1 tie gt 2's max; gts 3 and 4
        # share identical rows (same max proposal)
        overlaps[2, 0] = overlaps[2, 1] = 0.45
        overlaps[4] = overlaps[3]

        ref = mod.MaxIoUAssigner(
            pos_iou_thr=0.1, neg_iou_thr=0.1, min_pos_iou=0,
            ignore_iof_thr=-1,
        )
        res = ref.assign_wrt_overlaps(torch.from_numpy(overlaps))
        want = res.gt_inds.numpy()
        # the oriented config's equal thresholds leave no -1 survivors
        assert (want >= 0).all()

        got = np.asarray(max_iou_assign_from_overlaps(
            jnp.asarray(overlaps),
            jnp.ones((n,), bool), jnp.ones((g,), bool),
            pos_iou_thr=0.1, neg_iou_thr=0.1, min_pos_iou=0.0,
        ))
        np.testing.assert_array_equal(got, want)


class TestGiouLossParity:
    def test_loss_and_filtered_grad_match_reference(self):
        """Execute the reference's GIoULoss autograd Function
        (iou_loss.py:69-129) with its CUDA convex_giou op replaced by OUR
        geometry (ops.geometry.convex_giou + jax vjp), and assert both the
        loss value and d loss/d pred — including the signed grad>1 filter
        and the ignored upstream cotangent — match our custom_vjp
        giou_loss."""
        import jax
        import jax.numpy as jnp
        from orientedreppoints_tpu.core.losses import giou_loss
        from orientedreppoints_tpu.ops.geometry import convex_giou

        saved = dict(sys.modules)
        try:
            def fake_convex_giou(pred_t, target_t):
                pred = jnp.asarray(pred_t.detach().numpy())
                target = jnp.asarray(target_t.detach().numpy())
                giou, vjp = jax.vjp(lambda p: convex_giou(p, target), pred)
                (grad,) = vjp(jnp.ones_like(giou))
                return (torch.from_numpy(np.asarray(giou)),
                        torch.from_numpy(np.asarray(grad)))

            def stub(name, **attrs):
                m = types.ModuleType(name)
                for k, v in attrs.items():
                    setattr(m, k, v)
                sys.modules[name] = m
                return m

            stub("mmdet")
            stub("mmdet.core", bbox_overlaps=lambda *a, **k: None)
            stub("mmdet.ops")
            stub("mmdet.ops.iou", convex_giou=fake_convex_giou)
            _pkg("refloss", None)

            class _Registry:
                def register_module(self, cls=None):
                    return cls if cls is not None else (lambda c: c)

            stub("refloss.registry", LOSSES=_Registry())
            stub("refloss.utils", weighted_loss=lambda f: f)
            _pkg("refloss.losses", osp.join(REF, "mmdet/models/losses"))
            mod = _load("refloss.losses.iou_loss",
                        osp.join(REF, "mmdet/models/losses/iou_loss.py"))

            rng = np.random.RandomState(0)
            m = 24
            # half normal-scale rows, half tiny-scale rows whose analytic
            # grads exceed 1 so the filter actually fires
            pred = np.zeros((m, 18), np.float32)
            target = np.zeros((m, 8), np.float32)
            for i in range(m):
                scale = 20.0 if i < m // 2 else 0.08
                c = rng.rand(2) * 100
                pred[i] = (rng.randn(9, 2) * scale + c).reshape(-1)
                w, h = rng.rand(2) * scale + scale / 2
                r = np.array([[-w/2, -h/2], [w/2, -h/2],
                              [w/2, h/2], [-w/2, h/2]])
                target[i] = (r + c + rng.randn(2) * scale * 0.2).reshape(-1)
            weight = np.ones((m,), np.float32)

            ref_loss_mod = mod.GIoULoss(reduction="mean", loss_weight=0.375)
            pred_t = torch.from_numpy(pred.copy()).requires_grad_(True)
            loss_t = ref_loss_mod(pred_t, torch.from_numpy(target),
                                  torch.from_numpy(weight))
            loss_t.backward()
            want_loss = float(loss_t)
            want_grad = pred_t.grad.numpy()

            ours = jax.jit(lambda p: giou_loss(
                p, jnp.asarray(target), jnp.asarray(weight),
                divisor=m, loss_weight=0.375))
            got_loss = float(ours(jnp.asarray(pred)))
            got_grad = np.asarray(jax.grad(
                lambda p: ours(p))(jnp.asarray(pred)))

            # confirm the filter actually fired: filtered rows become
            # constant -eps/N*lw across all 18 components
            filtered_val = -1e-6 / m * 0.375
            row_is_filtered = np.all(
                np.abs(want_grad - filtered_val) < 1e-12, axis=1)
            assert row_is_filtered.any(), "fixture never triggers the filter"
            np.testing.assert_allclose(got_loss, want_loss, rtol=1e-5)
            np.testing.assert_allclose(got_grad, want_grad, rtol=1e-4,
                                       atol=1e-7)
        finally:
            _restore_sys_modules(saved)


@pytest.fixture(scope="module")
def ref_result_merge():
    saved = dict(sys.modules)
    try:
        from orientedreppoints_tpu.devkit.polygon import poly_iou

        pio = types.ModuleType("DOTA_devkit.polyiou")
        pio.VectorDouble = lambda x: np.asarray(x, np.float64)
        pio.iou_poly = lambda a, b: float(poly_iou(np.asarray(a),
                                                   np.asarray(b)))
        du = types.ModuleType("DOTA_devkit.dota_utils")
        # ResultMerge only touches util.custombasename and
        # util.GetFileFromThisRootDir (the real dota_utils imports
        # shapely, absent here); faithful minimal re-implementations
        du.custombasename = lambda p: osp.splitext(osp.basename(p))[0]

        def _files(root, ext=".txt"):
            return [osp.join(root, f) for f in sorted(os.listdir(root))
                    if f.endswith(ext)]

        du.GetFileFromThisRootDir = _files
        pkg = types.ModuleType("DOTA_devkit")
        pkg.polyiou = pio
        pkg.dota_utils = du
        sys.modules["DOTA_devkit"] = pkg
        sys.modules["DOTA_devkit.polyiou"] = pio
        sys.modules["DOTA_devkit.dota_utils"] = du
        mod = _load("refmerge",
                    osp.join(REF, "DOTA_devkit/ResultMerge_multi_process.py"))
        yield mod
    finally:
        _restore_sys_modules(saved)


class TestResultMergeParity:
    def _parse(self, path):
        rows = []
        with open(path) as f:
            for line in f:
                p = line.split()
                if len(p) >= 10:
                    rows.append((p[0], round(float(p[1]), 4),
                                 tuple(round(float(v), 2) for v in p[2:10])))
        return sorted(rows)

    def test_merge_matches_reference(self, ref_result_merge, tmp_path):
        """Execute the reference's own tile-merge + polygon NMS
        (mergebase with py_cpu_nms_poly_fast, thresh 0.1) on synthetic
        patch-level Task1 files — multi-rate tiles, cross-tile duplicate
        detections — and compare the merged per-image outputs with our
        merge_by_poly."""
        from orientedreppoints_tpu.devkit.result_merge import merge_by_poly

        rng = np.random.RandomState(9)
        src = tmp_path / "src"
        dst_ref = tmp_path / "dst_ref"
        dst_ours = tmp_path / "dst_ours"
        for d in (src, dst_ref, dst_ours):
            d.mkdir()

        lines = []
        for oriname in ("P0007", "P0042"):
            for rate, (ox, oy) in (("1.0", (0, 0)), ("1.0", (512, 0)),
                                   ("0.5", (0, 0))):
                tile = f"{oriname}__{rate}__{ox}___{oy}"
                for _ in range(6):
                    base = _random_gts(rng, 1, 400)[0]
                    sc = rng.rand()
                    lines.append(f"{tile} {sc:.4f} "
                                 + " ".join(f"{v:.2f}" for v in base))
        # one explicit cross-tile duplicate pair per image: poly at orig
        # (600..), seen by tile (512,0) at x-512 and by rate-0.5 tile at /2
        for oriname in ("P0007", "P0042"):
            orig = _random_gts(rng, 1, 200)[0] + np.tile([600.0, 100.0], 4)
            in_tile2 = orig - np.tile([512.0, 0.0], 4)
            in_tile3 = orig * 0.5
            lines.append(f"{oriname}__1.0__512___0 0.9000 "
                         + " ".join(f"{v:.2f}" for v in in_tile2))
            lines.append(f"{oriname}__0.5__0___0 0.8000 "
                         + " ".join(f"{v:.2f}" for v in in_tile3))
        (src / "Task1_plane.txt").write_text("\n".join(lines) + "\n")

        ref_result_merge.mergebase(str(src), str(dst_ref),
                                   ref_result_merge.py_cpu_nms_poly_fast)
        merge_by_poly(str(src), str(dst_ours), num_process=1)

        want = self._parse(dst_ref / "Task1_plane.txt")
        got = self._parse(dst_ours / "Task1_plane.txt")
        assert len(want) > 0
        assert got == want


# ---------------------------------------------------------------------------
# pointset_target: the full target-builder composites executed verbatim
# ---------------------------------------------------------------------------


@pytest.fixture(scope="class")
def ref_pointset_target():
    """Load the reference's pointset_target.py (core/bbox/pointset_target.py)
    with its REAL collaborators executed verbatim: PointAssigner,
    MaxIoUAssigner, PseudoSampler + SamplingResult, multi_apply / unmap
    (core/utils/misc.py) and images_to_levels.

    Documented shims (not parity surfaces): the CUDA convex_overlaps op is
    backed by our geometry (shared by both sides — the matrix consumers are
    the surface under test); build_assigner's mmcv obj_from_dict branch is
    bypassed by passing constructed assigner instances, mirroring the real
    isinstance pass-through branch (assign_sampling.py:7-9); mmcv/mmdet glue
    modules are stubbed."""
    saved = dict(sys.modules)
    saved_cuda = torch.Tensor.cuda
    try:
        # assign_result.py:45 calls .cuda() unconditionally; run it on CPU
        torch.Tensor.cuda = lambda self, *a, **k: self

        def stub(name, **attrs):
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
            return m

        stub("mmcv")
        _pkg("mmdet", None)
        utils = _pkg("mmdet.utils", None)
        um = types.ModuleType("mmdet.utils.util_mixins")
        um.NiceRepr = object
        sys.modules["mmdet.utils.util_mixins"] = um
        utils.util_mixins = um

        def convex_overlaps(gt_rbboxes, points):
            """The CUDA convex-IoU matrix, backed by OUR geometry."""
            import jax.numpy as jnp
            from orientedreppoints_tpu.ops.geometry import convex_iou

            ov = convex_iou(jnp.asarray(gt_rbboxes.detach().numpy()),
                            jnp.asarray(points.detach().numpy()))
            return torch.from_numpy(np.asarray(ov))

        stub("mmdet.ops")
        stub("mmdet.ops.iou", convex_overlaps=convex_overlaps)

        _pkg("refpst", None)
        # misc.py top-level holds multi_apply + unmap — load it AS the
        # `..utils` package pointset_target.py imports from
        _load("refpst.utils", osp.join(REF, "mmdet/core/utils/misc.py"))
        _pkg("refpst.bbox", osp.join(REF, "mmdet/core/bbox"))

        spath = osp.join(REF, "mmdet/core/bbox/samplers")
        samplers = _pkg("refpst.bbox.samplers", spath)
        _load("refpst.bbox.samplers.sampling_result",
              osp.join(spath, "sampling_result.py"))
        _load("refpst.bbox.samplers.base_sampler",
              osp.join(spath, "base_sampler.py"))
        ps = _load("refpst.bbox.samplers.pseudo_sampler",
                   osp.join(spath, "pseudo_sampler.py"))
        samplers.PseudoSampler = ps.PseudoSampler

        apath = osp.join(REF, "mmdet/core/bbox/assigners")
        _pkg("refpstassign", apath)
        _load("refpstassign.assign_result",
              osp.join(apath, "assign_result.py"))
        _load("refpstassign.base_assigner",
              osp.join(apath, "base_assigner.py"))
        pa = _load("refpstassign.point_assigner",
                   osp.join(apath, "point_assigner.py"))
        mia = _load("refpstassign.max_iou_assigner",
                    osp.join(apath, "max_iou_assigner.py"))

        stub("refpst.bbox.assign_sampling",
             build_assigner=lambda cfg, **kw: cfg,
             assign_and_sample=None)

        pst = _load("refpst.bbox.pointset_target",
                    osp.join(REF, "mmdet/core/bbox/pointset_target.py"))
        yield types.SimpleNamespace(
            pst=pst,
            PointAssigner=pa.PointAssigner,
            MaxIoUAssigner=mia.MaxIoUAssigner,
        )
    finally:
        torch.Tensor.cuda = saved_cuda
        _restore_sys_modules(saved)


def _proposal_sets(rng, points, gts, n_plant=40):
    """(N, 18) refine-stage proposals: small random blobs around each grid
    point (convex IoU ~ 0 vs any gt) with gt-shaped jittered point sets
    planted at n_plant random rows so the refine assigner sees real
    positives."""
    n = points.shape[0]
    g = gts.shape[0]
    props = (points[:, None, :2]
             + rng.randn(n, 9, 2).astype(np.float32)
             * points[:, None, 2:3] * 0.5).reshape(n, 18)
    rows = rng.choice(n, size=n_plant, replace=False)
    for i in rows:
        q = gts[rng.randint(g)].reshape(4, 2)
        mids = (q + np.roll(q, -1, axis=0)) / 2
        pts9 = np.concatenate([q, mids, q.mean(0, keepdims=True)], axis=0)
        props[i] = (pts9 + rng.randn(9, 2) * 1.5).reshape(-1)
    return props.astype(np.float32)


class TestPointsetTargetParity:
    STRIDES = [8, 16, 32, 64, 128]
    IMG = 128

    def _fixture(self, seed, masked, num_gt=7):
        rng = np.random.RandomState(seed)
        points, counts = _grid_points(self.IMG, self.STRIDES)
        n = points.shape[0]
        valid = np.ones((n,), bool)
        if masked:
            valid[rng.rand(n) < 0.08] = False
        gts = _random_gts(rng, num_gt, self.IMG)
        labels = rng.randint(1, 16, size=num_gt).astype(np.int64)
        return rng, points, counts, valid, gts, labels

    @staticmethod
    def _levels(arr, counts):
        out, start = [], 0
        for c in counts:
            out.append(torch.from_numpy(arr[start:start + c]))
            start += c
        return out

    @pytest.mark.parametrize("seed,masked", [(0, False), (1, True), (2, True)])
    def test_init_targets_match(self, ref_pointset_target, seed, masked):
        """init_pointset_target (pointset_target.py:6-121) executed verbatim
        — PointAssigner + PseudoSampler + unmap + images_to_levels — vs our
        init_targets_single on the same multi-level grid."""
        import jax.numpy as jnp
        from orientedreppoints_tpu.core.targets import init_targets_single

        _, points, counts, valid, gts, labels = self._fixture(seed, masked)
        cfg = types.SimpleNamespace(
            assigner=ref_pointset_target.PointAssigner(scale=4, pos_num=1),
            pos_weight=-1,
        )
        (labels_l, lw_l, gt_l, prop_l, pw_l, num_pos, num_neg,
         gi_l) = ref_pointset_target.pst.init_pointset_target(
            [self._levels(points, counts)],
            [self._levels(valid, counts)],
            [torch.from_numpy(gts)],
            [dict()], cfg,
            gt_labels_list=[torch.from_numpy(labels)],
            sampling=False, unmap_outputs=True,
        )
        want_labels = np.concatenate([t.numpy() for t in labels_l])
        want_lw = np.concatenate([t.numpy() for t in lw_l])
        want_gt = np.concatenate([t.numpy() for t in gt_l])
        want_prop = np.concatenate([t.numpy() for t in prop_l])
        want_pw = np.concatenate([t.numpy() for t in pw_l])
        want_gi = np.concatenate([t.numpy() for t in gi_l])

        got = init_targets_single(
            jnp.asarray(points), jnp.asarray(valid), jnp.asarray(gts),
            jnp.ones((gts.shape[0],), bool), jnp.asarray(labels),
            scale=4.0, pos_num=1,
        )
        np.testing.assert_array_equal(np.asarray(got.labels), want_labels)
        np.testing.assert_array_equal(np.asarray(got.label_weights), want_lw)
        np.testing.assert_array_equal(np.asarray(got.gt_polys), want_gt)
        np.testing.assert_array_equal(np.asarray(got.pos_weights), want_pw)
        np.testing.assert_array_equal(np.asarray(got.gt_inds), want_gi)
        pos = np.asarray(got.pos_weights) > 0
        assert pos.sum() > 0
        np.testing.assert_array_equal(
            np.where(pos[:, None], points, 0.0).astype(np.float32), want_prop)
        assert num_pos == max(int(pos.sum()), 1)
        assert num_neg == max(int((valid.sum() - pos.sum())), 1)

    @pytest.mark.parametrize("seed,masked", [(0, False), (3, True)])
    def test_refine_targets_match(self, ref_pointset_target, seed, masked):
        """refine_pointset_target (pointset_target.py:125-230) executed
        verbatim — MaxIoUAssigner over convex IoU + PseudoSampler + unmap +
        the wrapper's pos_inds/pos_gt_index extraction — vs our
        refine_targets_single."""
        import jax.numpy as jnp
        from orientedreppoints_tpu.core.targets import refine_targets_single

        rng, points, counts, valid, gts, labels = self._fixture(seed, masked)
        props = _proposal_sets(rng, points, gts)
        cfg = types.SimpleNamespace(
            assigner=ref_pointset_target.MaxIoUAssigner(
                pos_iou_thr=0.1, neg_iou_thr=0.1, min_pos_iou=0,
                ignore_iof_thr=-1),
            pos_weight=-1,
        )
        (all_labels, all_lw, all_gt, all_prop, all_pw, pos_inds,
         pos_gt_index) = ref_pointset_target.pst.refine_pointset_target(
            [self._levels(props, counts)],
            [self._levels(valid, counts)],
            [torch.from_numpy(gts)],
            [dict()], cfg,
            gt_labels_list=[torch.from_numpy(labels)],
            sampling=False, unmap_outputs=True,
        )

        got = refine_targets_single(
            jnp.asarray(props), jnp.asarray(valid), jnp.asarray(gts),
            jnp.ones((gts.shape[0],), bool), jnp.asarray(labels),
            pos_iou_thr=0.1, neg_iou_thr=0.1, min_pos_iou=0.0,
        )
        np.testing.assert_array_equal(np.asarray(got.labels),
                                      all_labels[0].numpy())
        np.testing.assert_array_equal(np.asarray(got.label_weights),
                                      all_lw[0].numpy())
        np.testing.assert_array_equal(np.asarray(got.gt_polys),
                                      all_gt[0].numpy())
        np.testing.assert_array_equal(np.asarray(got.pos_weights),
                                      all_pw[0].numpy())
        pos = np.asarray(got.pos_weights) > 0
        assert pos.sum() > 0
        np.testing.assert_array_equal(
            np.where(pos[:, None], props, 0.0).astype(np.float32),
            all_prop[0].numpy())
        np.testing.assert_array_equal(np.nonzero(pos)[0],
                                      pos_inds[0].numpy())
        np.testing.assert_array_equal(np.asarray(got.gt_inds)[pos],
                                      pos_gt_index[0].numpy())


# ---------------------------------------------------------------------------
# SpatialBorderLoss executed verbatim (point_justify CUDA op injected)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_border_loss():
    """Load the reference's spatial_border_loss.py with its CUDA pointsJf
    replaced by OUR ray-cast point-in-polygon (the loss arithmetic — diag
    flags, 0.2·center-distance, n_outside and n_pos normalizers — runs
    verbatim)."""
    saved = dict(sys.modules)
    try:
        def stub(name, **attrs):
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
            return m

        class _Registry:
            def register_module(self, cls):
                return cls

        def pointsJf(pts_t, gt_t, out_t):
            import jax
            import jax.numpy as jnp
            from orientedreppoints_tpu.ops.geometry import points_in_polygon

            pts = jnp.asarray(pts_t.detach().numpy())  # (n, 2)
            quads = jnp.asarray(
                gt_t.detach().numpy()).reshape(-1, 4, 2)  # (g, 4, 2)
            inside = jax.vmap(lambda q: points_in_polygon(pts, q))(quads)
            out_t.copy_(torch.from_numpy(
                np.asarray(inside).T.astype(np.float32)))

        # torch.nn for the nn.Module base
        stub("mmdet.ops.point_justify", pointsJf=pointsJf)
        _pkg("reflosses", None)
        stub("reflosses.registry", LOSSES=_Registry())
        _pkg("reflosses.losses",
             osp.join(REF, "mmdet/models/losses"))
        mod = _load(
            "reflosses.losses.spatial_border_loss",
            osp.join(REF, "mmdet/models/losses/spatial_border_loss.py"),
        )
        yield mod
    finally:
        _restore_sys_modules(saved)


class TestSpatialBorderLossParity:
    @pytest.mark.parametrize("seed,spread", [(0, 0.9), (1, 0.9), (2, 0.0)])
    def test_loss_matches_reference(self, ref_border_loss, seed, spread):
        """Positive rows as the head passes them (init_loss_single :294-318
        and the refine site :466-472 both pre-filter positives): point sets
        scattered around each gt center with `spread` ~ box size — large
        spread puts points outside (loss > 0), spread 0 collapses every
        point onto its gt center to exercise the all-inside zero branch."""
        import jax.numpy as jnp
        from orientedreppoints_tpu.core.losses import spatial_border_loss

        rng = np.random.RandomState(seed)
        m = 24
        gts = _random_gts(rng, m, 256)
        quads = gts.reshape(m, 4, 2)
        centers = quads.mean(axis=1)
        sizes = (quads.max(axis=1) - quads.min(axis=1))  # (m, 2)
        pts = (centers[:, None, :]
               + rng.randn(m, 9, 2) * sizes[:, None, :] * spread
               ).reshape(m, 18).astype(np.float32)
        weight = np.ones((m,), np.float32)

        ref = ref_border_loss.SpatialBorderLoss(loss_weight=0.05)
        want = float(ref(torch.from_numpy(pts), torch.from_numpy(gts),
                         torch.from_numpy(weight), y_first=False)[0])
        got = float(spatial_border_loss(
            jnp.asarray(pts), jnp.asarray(gts), jnp.asarray(weight),
            loss_weight=0.05))
        if spread == 0.0:
            assert want == 0.0
        else:
            assert want > 0.0
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


class TestRbboxFlipParity:
    def test_flip_and_mapping_back(self):
        """rbbox_flip / rbbox_mapping_back (core/bbox/transforms.py:273-301)
        executed verbatim vs our core.rbox equivalents — the `dim - x - 1`
        flip rule and the scale-factor unmap used by aug_test TTA merging."""
        saved = dict(sys.modules)
        sys.modules["mmcv"] = types.ModuleType("mmcv")
        try:
            mod = _load("reftransforms_flip",
                        osp.join(REF, "mmdet/core/bbox/transforms.py"))
            from orientedreppoints_tpu.core.rbox import (
                rbbox_flip, rbbox_mapping_back,
            )

            rng = np.random.RandomState(0)
            polys = (rng.rand(20, 8) * 500).astype(np.float32)
            shape = (600, 800, 3)
            for d in ("horizontal", "vertical"):
                want = mod.rbbox_flip(torch.from_numpy(polys), shape,
                                      d).numpy()
                np.testing.assert_array_equal(rbbox_flip(polys, shape, d),
                                              want)
            for flip, d, sf in ((True, "horizontal", 1.5),
                                (True, "vertical", 0.5), (False, "horizontal", 2.0)):
                want = mod.rbbox_mapping_back(
                    torch.from_numpy(polys), shape, sf, flip, d).numpy()
                got = rbbox_mapping_back(polys, shape, sf, flip, d)
                np.testing.assert_allclose(got, want, rtol=1e-6)
        finally:
            _restore_sys_modules(saved)


# ---------------------------------------------------------------------------
# APAA feature-quality term + its grid_sample feature sampling, verbatim
# ---------------------------------------------------------------------------


class TestFeatureCosineParity:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_dissimilarity_matches_reference(self, ref_head, seed):
        """feature_cosine_similarity (orientedreppoints_head.py:576-600)
        executed verbatim on random point features — incl. the 1e-2 norm
        clamp (exercised by near-zero rows) — vs our feature_dissimilarity."""
        import jax.numpy as jnp
        from orientedreppoints_tpu.core.apaa import feature_dissimilarity

        rng = np.random.RandomState(seed)
        feats = rng.randn(32, 9, 256).astype(np.float32)
        feats[3] *= 1e-4  # trip the min=1e-2 norm clamp
        feats[7, 4] = 0.0  # one exactly-zero point feature

        ns = types.SimpleNamespace()
        want = ref_head.OrientedRepPointsHead.feature_cosine_similarity(
            ns, torch.from_numpy(feats)).numpy()
        got = np.asarray(feature_dissimilarity(jnp.asarray(feats)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestAdaptivePointsFeatureParity:
    @pytest.mark.parametrize("stride", [8, 32])
    def test_grid_sample_matches_reference(self, ref_head, stride):
        """get_adaptive_points_feature (orientedreppoints_head.py:495-520,
        torch grid_sample align_corners=False zero-padding) executed verbatim
        vs our sample_point_features bilinear gather at loc/stride - 0.5 —
        including out-of-image locations (zero padding)."""
        import jax.numpy as jnp
        from orientedreppoints_tpu.core.loss_head import sample_point_features

        rng = np.random.RandomState(0)
        b, hw, c, p = 2, 16, 8, 24
        feats_nchw = rng.randn(b, c, hw, hw).astype(np.float32)
        img = hw * stride
        # locations spanning the image, a margin outside, and exact corners
        locs = (rng.rand(b, p, 9, 2) * (img * 1.2) - img * 0.1).astype(
            np.float32)
        locs[0, 0, 0] = (0.0, 0.0)
        locs[0, 0, 1] = (img - 1.0, img - 1.0)
        locs = locs.reshape(b, p, 18)

        ns = types.SimpleNamespace()
        (want_t,) = ref_head.OrientedRepPointsHead.get_adaptive_points_feature(
            ns, torch.from_numpy(feats_nchw), torch.from_numpy(locs), stride)
        want = want_t.numpy().transpose(0, 2, 3, 1)  # (b, P, 9, c)

        feats_nhwc = jnp.asarray(feats_nchw.transpose(0, 2, 3, 1))
        got = np.asarray(sample_point_features(
            [feats_nhwc], jnp.asarray(locs),
            jnp.zeros((b, p), jnp.int32), [stride]))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def ref_focal_loss():
    """Load the reference FocalLoss (models/losses/focal_loss.py) with its
    real weight_reduce_loss (losses/utils.py, executed verbatim) and the
    CUDA `sigmoid_focal_loss` op shimmed to the kernel's exact formula
    (sigmoid_focal_loss_cuda.cu:30-56: integer targets 1..C against
    class_range, term1/term2 with alpha/(1-alpha) weights)."""
    saved = dict(sys.modules)
    try:
        def cuda_like_sigmoid_focal_loss(pred, target, gamma, alpha):
            c = pred.shape[1]
            class_range = torch.arange(
                1, c + 1, dtype=pred.dtype).unsqueeze(0)
            t = target.to(pred.dtype).unsqueeze(1)
            p = torch.sigmoid(pred)
            term1 = (1 - p).pow(gamma) * torch.log(
                torch.clamp(p, min=torch.finfo(torch.float32).tiny))
            # the kernel's numerically-stable log(1-sigmoid(x))
            term2 = p.pow(gamma) * (
                -pred * (pred >= 0).to(pred.dtype)
                - torch.log1p(torch.exp(
                    pred - 2 * pred * (pred >= 0).to(pred.dtype)))
            )
            c1 = (t == class_range).to(pred.dtype)
            c2 = ((t >= 0) & (t != class_range)).to(pred.dtype)
            return -c1 * term1 * alpha - c2 * term2 * (1 - alpha)

        def stub(name, **attrs):
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
            return m

        stub("mmdet")
        stub("mmdet.ops", sigmoid_focal_loss=cuda_like_sigmoid_focal_loss)
        _pkg("reffocal", None)

        class _Registry:
            def register_module(self, cls=None):
                return cls if cls is not None else (lambda c: c)

        stub("reffocal.registry", LOSSES=_Registry())
        base = osp.join(REF, "mmdet/models/losses")
        _pkg("reffocal.losses", base)
        _load("reffocal.losses.utils", osp.join(base, "utils.py"))
        mod = _load("reffocal.losses.focal_loss",
                    osp.join(base, "focal_loss.py"))
        yield mod
    finally:
        _restore_sys_modules(saved)


@pytest.fixture(scope="module")
def ref_giou_loss():
    """Reference GIoULoss (iou_loss.py:69-129) with its CUDA convex_giou
    replaced by OUR geometry values+grads (same injection the GIoU loss
    parity test uses; the IoU itself is independently checked against the
    compiled reference polyiou.cpp in test_reference_native_parity.py)."""
    import jax
    import jax.numpy as jnp
    from orientedreppoints_tpu.ops.geometry import convex_giou

    saved = dict(sys.modules)
    try:
        def fake_convex_giou(pred_t, target_t):
            pred = jnp.asarray(pred_t.detach().numpy())
            target = jnp.asarray(target_t.detach().numpy())
            giou, vjp = jax.vjp(lambda p: convex_giou(p, target), pred)
            (grad,) = vjp(jnp.ones_like(giou))
            return (torch.from_numpy(np.asarray(giou)),
                    torch.from_numpy(np.asarray(grad)))

        def stub(name, **attrs):
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
            return m

        stub("mmdet")
        stub("mmdet.core", bbox_overlaps=lambda *a, **k: None)
        stub("mmdet.ops")
        stub("mmdet.ops.iou", convex_giou=fake_convex_giou)
        _pkg("refgiou", None)

        class _Registry:
            def register_module(self, cls=None):
                return cls if cls is not None else (lambda c: c)

        stub("refgiou.registry", LOSSES=_Registry())
        stub("refgiou.utils", weighted_loss=lambda f: f)
        base = osp.join(REF, "mmdet/models/losses")
        _pkg("refgiou.losses", base)
        mod = _load("refgiou.losses.iou_loss", osp.join(base, "iou_loss.py"))
        yield mod
    finally:
        _restore_sys_modules(saved)


@pytest.fixture(scope="module")
def ref_chamfer():
    """The reference ChamferDistance2D wrapper (ops/chamfer_distance.py:6-25)
    executed verbatim, with the raw CUDA Chamfer2D kernel shimmed to its
    spec: squared nearest-neighbor distances both ways (dist_chamfer_2d.py
    forward)."""
    saved = dict(sys.modules)
    try:
        class FakeChamfer2D:
            def __call__(self, a, b):
                d2 = torch.cdist(a, b).pow(2)
                return (d2.min(dim=2).values, d2.min(dim=1).values,
                        None, None)

        def stub(name, **attrs):
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
            return m

        stub("mmdet")
        stub("mmdet.ops")
        stub("mmdet.ops.chamfer_2d", Chamfer2D=FakeChamfer2D)
        mod = _load("ref_chamfer_distance",
                    osp.join(REF, "mmdet/ops/chamfer_distance.py"))
        yield mod
    finally:
        _restore_sys_modules(saved)


def _cv2_minarearect(pts_t):
    """Independent minaerarect shim: cv2.minAreaRect per row.  Corner
    traversal order may differ from the CUDA kernel's, but the head only
    consumes the corners through sampling_points -> Chamfer (a set
    distance), which is traversal-invariant for a rectangle."""
    pts = pts_t.detach().numpy().reshape(pts_t.shape[0], -1, 2)
    out = np.zeros((pts.shape[0], 8), np.float32)
    for i, p in enumerate(pts):
        rect = cv2.minAreaRect(p.astype(np.float32))
        out[i] = cv2.boxPoints(rect).reshape(-1)
    return torch.from_numpy(out)


class TestApaaQualityParity:
    """Composite APAA quality Q (points_quality_assessment,
    orientedreppoints_head.py:522-573) executed under torch-CPU — the
    reference's own weighted composition Q = L_cls.sum + 0.2*(L_loc_init +
    0.3*L_ori_init) + 0.8*(L_loc_refine + 0.3*L_ori_refine) + 0.1*dissim,
    with its real FocalLoss/GIoULoss/ChamferDistance2D/
    feature_cosine_similarity/sampling_points plumbing — vs our
    core/apaa.py quality_assessment on shared fixtures; then both Q
    vectors through each side's sample selection, asserting the SAME
    final keep/demote decision per positive."""

    def _fixtures(self, seed, p=48, nc=15, feat_c=64):
        rng = np.random.RandomState(seed)
        gts = _random_gts(rng, p, 512)
        centers = gts.reshape(p, 4, 2).mean(axis=1)
        pts_init = np.zeros((p, 18), np.float32)
        pts_refine = np.zeros((p, 18), np.float32)
        for i in range(p):
            scale = np.abs(gts[i].reshape(4, 2) - centers[i]).max() + 4
            pts_init[i] = (rng.randn(9, 2) * scale * 0.7
                           + centers[i]).reshape(-1)
            pts_refine[i] = (rng.randn(9, 2) * scale * 0.4
                             + centers[i]).reshape(-1)
        cls_scores = rng.randn(p, nc).astype(np.float32) * 2
        labels = rng.randint(1, nc + 1, size=p).astype(np.int64)
        feats = rng.randn(p, 9, feat_c).astype(np.float32)
        return gts, pts_init, pts_refine, cls_scores, labels, feats

    def _ref_quality(self, ref_head, ref_focal_loss, ref_giou_loss,
                     ref_chamfer, gts, pts_init, pts_refine, cls_scores,
                     labels, feats, minarearect=None):
        p = gts.shape[0]
        ns = types.SimpleNamespace()
        ns.loss_cls = ref_focal_loss.FocalLoss(
            use_sigmoid=True, gamma=2.0, alpha=0.25, loss_weight=1.0)
        ns.loss_rbox_refine = ref_giou_loss.GIoULoss(loss_weight=1.0)
        head_cls = ref_head.OrientedRepPointsHead
        ns.feature_cosine_similarity = (
            head_cls.feature_cosine_similarity.__get__(ns))
        ns.sampling_points = head_cls.sampling_points.__get__(ns)
        # the loaded head module's CUDA ops are inert stubs; swap in the
        # executable shims for the duration of the call
        saved_ops = (ref_head.minaerarect, ref_head.ChamferDistance2D)
        ref_head.minaerarect = minarearect or _cv2_minarearect
        ref_head.ChamferDistance2D = ref_chamfer.ChamferDistance2D
        try:
            (qua,) = head_cls.points_quality_assessment(
                ns,
                torch.from_numpy(feats),          # points_features (P,9,C)
                torch.from_numpy(cls_scores),
                torch.from_numpy(pts_init),
                torch.from_numpy(pts_refine),
                torch.from_numpy(labels),
                torch.from_numpy(gts),
                torch.ones(p),                    # label_weight
                torch.ones(p),                    # rbox_weight
                torch.arange(p),                  # pos_inds: all rows
            )
        finally:
            ref_head.minaerarect, ref_head.ChamferDistance2D = saved_ops
        return qua.detach().numpy()

    def _our_quality(self, gts, pts_init, pts_refine, cls_scores, labels,
                     feats):
        import jax.numpy as jnp
        from orientedreppoints_tpu.core.apaa import (
            PosCandidates, quality_assessment,
        )

        p = gts.shape[0]
        cand = PosCandidates(
            idx=jnp.arange(p, dtype=jnp.int32),
            mask=jnp.ones((p,), bool),
            gt_idx=jnp.zeros((p,), jnp.int32),
            level=jnp.zeros((p,), jnp.int32),
        )
        return np.asarray(quality_assessment(
            cand, jnp.asarray(cls_scores), jnp.asarray(pts_init),
            jnp.asarray(pts_refine), jnp.asarray(labels),
            jnp.asarray(gts), jnp.asarray(feats),
        ))

    @staticmethod
    def _same_rect_mask(a, b, tol=1e-2):
        """Rows where two min-area-rect implementations returned the SAME
        rectangle (as a corner set; traversal order ignored).  A 9-point
        gaussian blob occasionally admits two enclosing rectangles whose
        areas tie to ~1e-6 relative — cv2.minAreaRect and our calipers
        then legitimately pick different minima, and the chamfer term is
        unscoreable on those rows."""
        A = a.reshape(-1, 4, 2)
        B = b.reshape(-1, 4, 2)
        d = np.linalg.norm(A[:, :, None, :] - B[:, None, :, :], axis=-1)
        return np.maximum(d.min(2).max(1), d.min(1).max(1)) < tol

    @pytest.mark.parametrize("seed", [0, 1])
    def test_quality_matches_reference(self, ref_head, ref_focal_loss,
                                       ref_giou_loss, ref_chamfer, seed):
        import jax.numpy as jnp
        from orientedreppoints_tpu.ops.geometry import min_area_rect

        fx = self._fixtures(seed)
        gts, pts_init, pts_refine = fx[0], fx[1], fx[2]
        want = self._ref_quality(ref_head, ref_focal_loss, ref_giou_loss,
                                 ref_chamfer, *fx)
        got = self._our_quality(*fx)
        assert want.shape == got.shape == (gts.shape[0],)
        # exclude area-tie rows (see _same_rect_mask); both sides' rect
        # AREAS agree to 1e-6 everywhere — only the tie CHOICE differs
        mask = np.ones((gts.shape[0],), bool)
        for pts in (pts_init, pts_refine):
            ours = np.asarray(min_area_rect(jnp.asarray(pts)))
            cv = _cv2_minarearect(torch.from_numpy(pts)).numpy()
            mask &= self._same_rect_mask(ours, cv)
        assert mask.mean() > 0.8, f"too many tie rows: {mask.sum()}"
        np.testing.assert_allclose(got[mask], want[mask],
                                   rtol=2e-4, atol=2e-4)

    def test_quality_drives_same_selection(self, ref_head, ref_focal_loss,
                                           ref_giou_loss, ref_chamfer):
        """End-to-end: each side's Q through each side's selection on a
        realistic sparse-positive layout -> identical keep sets."""
        import jax.numpy as jnp
        from orientedreppoints_tpu.core.apaa import (
            compact_positives, sample_selection,
        )

        rng = np.random.RandomState(7)
        strides = [8, 16, 32, 64, 128]
        img = 256
        counts = [(img // s) ** 2 for s in strides]
        n = sum(counts)
        num_gt = 4
        n_pos = 36

        gt_inds = np.zeros((n,), np.int64)
        pos_idx = np.sort(rng.choice(n, size=n_pos, replace=False))
        gt_inds[pos_idx] = rng.randint(1, num_gt + 1, size=n_pos)
        pos_inds = np.nonzero(gt_inds)[0]
        pos_gt_inds = gt_inds[pos_inds]

        # per-positive quality fixtures (geometry in image coords);
        # minaerarect is backed by OUR kernel on both sides here so a rect
        # area-tie cannot flip the selection ORDER — the surface under
        # test is the composite-Q-driven selection/demotion decision (the
        # Q values themselves are independently cv2-checked above)
        from orientedreppoints_tpu.ops.geometry import min_area_rect

        def our_minarearect(pts_t):
            return torch.from_numpy(np.asarray(min_area_rect(
                jnp.asarray(pts_t.detach().numpy()))))

        fx = self._fixtures(11, p=n_pos)
        gts, pts_init, pts_refine, cls_scores, labels, feats = fx
        q_ref = self._ref_quality(ref_head, ref_focal_loss, ref_giou_loss,
                                  ref_chamfer, *fx,
                                  minarearect=our_minarearect)
        q_ours_pos = self._our_quality(*fx)

        label_full = np.zeros((n,), np.int64)
        label_full[pos_inds] = labels
        ns = types.SimpleNamespace(
            top_ratio=0.4, point_base_scale=2, point_strides=strides)
        (r_label, _, r_rbox_w, r_num_pos, _) = (
            ref_head.OrientedRepPointsHead.point_samples_selection(
                ns,
                torch.from_numpy(q_ref).float(),
                torch.from_numpy(label_full.copy()),
                torch.ones(n),
                torch.from_numpy(
                    (gt_inds > 0).astype(np.float32)),
                torch.from_numpy(pos_inds),
                torch.from_numpy(pos_gt_inds),
                num_proposals_each_level=list(counts),
                num_level=len(strides),
            ))
        kept_ref = np.sort(pos_inds[r_rbox_w.numpy()[pos_inds] > 0])

        level_of = np.concatenate(
            [np.full((c,), li) for li, c in enumerate(counts)])
        cand = compact_positives(jnp.asarray(gt_inds),
                                 jnp.asarray(level_of), max_pos=64)
        cand_np = np.asarray(cand.idx)
        # scatter our per-positive Q into candidate slot order
        q_map = {int(i): float(q) for i, q in zip(pos_inds, q_ours_pos)}
        q_cand = np.array([q_map.get(int(i), np.inf) for i in cand_np],
                          np.float32)
        keep = np.asarray(sample_selection(
            cand, jnp.asarray(q_cand), num_gt, len(strides),
            per_level_topk=6, top_ratio=0.4))
        kept_ours = np.sort(cand_np[keep])

        np.testing.assert_array_equal(kept_ours, kept_ref)
        assert int(r_num_pos) == len(kept_ours)
        demoted = np.setdiff1d(pos_inds, kept_ref)
        assert (r_label.numpy()[demoted] == 0).all()
