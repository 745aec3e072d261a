"""Differential parity against the reference's COMPILED native CPU code.

The reference's CUDA kernels cannot run here, but its host C++ can:

  * mmdet/ops/nms/src/rnms_cpu.cpp — the exact rotated-NMS semantics
    (same `ovr > threshold` decision as rnms_kernel.cu:131-147), built
    verbatim as a torch CPU extension and driven through its soft_rnms
    entry (method=0 == original hard NMS, min_score ~0);
  * mmdet/ops/nms/src/nms_cpu.cpp — horizontal nms (legacy +1 pixel
    areas, inclusive >= suppression, nms_cpu.cpp:19,56) and soft_nms;
  * DOTA_devkit/polyiou.cpp — the exact polygon IoU every official
    evaluator and ResultMerge path consumes (iou_poly, polyiou.cpp:108),
    built with g++ behind a tiny extern-C shim and called via ctypes.

These are UNTRUSTED TEST FIXTURES: compiled and executed at test time,
never linked into the package.  Until this file existed, the device NMS
keep-set and the csrc/device IoU had only been checked against the repo's
own host re-implementations — a shared misreading of tie/threshold
semantics would have been invisible.

Tie semantics note (documented, not a bug): with exactly equal scores the
reference selects the earliest index first (its max-scan keeps the first
maximum) while our argsort-descending ranks the later index first; all
random fixtures below use distinct scores.  At IoU exactly == threshold
both sides agree (strict > for rotated, inclusive >= for horizontal), but
the two exact-IoU implementations may differ in the last float32 ulp, so
the adversarial fixtures step +-1e-3 around the threshold rather than
landing on it.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

jnp = pytest.importorskip("jax.numpy")

REF = "/root/reference"
BUILD_ROOT = "/tmp/orp_ref_native"

pytestmark = pytest.mark.skipif(
    not osp.isdir(REF), reason="reference checkout not mounted"
)

# Content pins for the UNTRUSTED reference sources compiled below (ADVICE
# r4): executing native code from the public checkout is the point of the
# harness, but only the exact sources that were audited — a modified
# checkout fails loudly here instead of running arbitrary code at test time.
_REF_SHA256 = {
    "mmdet/ops/nms/src/rnms_cpu.cpp":
        "b6092fcf071446e0b930dac1e829ddb2f03db9751b491295eca076f1d9063e06",
    "mmdet/ops/nms/src/nms_cpu.cpp":
        "a538f959cc126a4bfd613e34b53605a1635f9cce1e469d09e71370adaec7634a",
    "DOTA_devkit/polyiou.cpp":
        "ffbe0459419f962ce1695cd4c49beacb97b95ca42381f244da91f5b56dcb301a",
}


def _pinned_source(rel: str) -> str:
    import hashlib

    path = osp.join(REF, rel)
    with open(path, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    assert digest == _REF_SHA256[rel], (
        f"reference source {rel} changed (sha256 {digest}); re-audit before "
        "compiling it as a test fixture"
    )
    return path


def _restore_sys_modules(saved):
    """Surgical sys.modules restore (same rationale as the helper in
    test_reference_parity.py): drop only modules whose root package did
    not exist at fixture setup; blanket clear()+update purged
    lazily-imported jax internals and broke later re-imports."""
    for k in list(sys.modules):
        if k not in saved and k.split(".", 1)[0] not in saved:
            del sys.modules[k]
    for k, v in saved.items():
        if sys.modules.get(k) is not v:
            sys.modules[k] = v


def _cpp_ext(name: str, source: str):
    from torch.utils import cpp_extension

    build = osp.join(BUILD_ROOT, name)
    os.makedirs(build, exist_ok=True)
    return cpp_extension.load(
        name=name, sources=[source], build_directory=build, verbose=False
    )


@pytest.fixture(scope="module")
def ref_rnms():
    """rnms_cpu.cpp compiled verbatim (torch 2.x still accepts its
    deprecated .data<T>()/.type() calls)."""
    return _cpp_ext(
        "orp_ref_rnms_cpu", _pinned_source("mmdet/ops/nms/src/rnms_cpu.cpp")
    )


@pytest.fixture(scope="module")
def ref_nms():
    return _cpp_ext(
        "orp_ref_nms_cpu", _pinned_source("mmdet/ops/nms/src/nms_cpu.cpp")
    )


@pytest.fixture(scope="module")
def ref_polyiou():
    """iou_poly from DOTA_devkit/polyiou.cpp via a 4-line extern-C shim
    (the reference file itself is compiled unmodified)."""
    build = osp.join(BUILD_ROOT, "polyiou")
    os.makedirs(build, exist_ok=True)
    so = osp.join(build, "libref_polyiou.so")
    src = _pinned_source("DOTA_devkit/polyiou.cpp")
    wrapper = osp.join(build, "wrapper.cpp")
    if not osp.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        with open(wrapper, "w") as f:
            f.write(
                "#include <vector>\n"
                "double iou_poly(std::vector<double> p,"
                " std::vector<double> q);\n"
                'extern "C" double ref_iou_poly(const double* p,'
                " const double* q) {\n"
                "  return iou_poly(std::vector<double>(p, p + 8),"
                " std::vector<double>(q, q + 8));\n"
                "}\n"
            )
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-shared", wrapper, src, "-o", so],
            check=True, capture_output=True,
        )
    lib = ctypes.CDLL(so)
    lib.ref_iou_poly.restype = ctypes.c_double
    lib.ref_iou_poly.argtypes = [ctypes.POINTER(ctypes.c_double)] * 2

    def iou(p, q):
        pa = (ctypes.c_double * 8)(*[float(v) for v in np.ravel(p)])
        qa = (ctypes.c_double * 8)(*[float(v) for v in np.ravel(q)])
        return lib.ref_iou_poly(pa, qa)

    return iou


def _rot_rect(cx, cy, w, h, a):
    c, s = np.cos(a), np.sin(a)
    r = np.array([[-w / 2, -h / 2], [w / 2, -h / 2],
                  [w / 2, h / 2], [-w / 2, h / 2]])
    return ((r @ [[c, s], [-s, c]]) + [cx, cy]).reshape(-1)


def _clustered_quads(rng, n, n_clusters=6, span=60.0):
    """Rotated rects around a few cluster centers -> many real overlaps."""
    centers = rng.rand(n_clusters, 2) * 400 + 100
    out = np.zeros((n, 8), np.float32)
    for i in range(n):
        cx, cy = centers[i % n_clusters] + rng.randn(2) * span * 0.2
        w, h = rng.rand(2) * span + 12
        out[i] = _rot_rect(cx, cy, w, h, rng.rand() * np.pi)
    return out


def _near_threshold_pairs(rng, thr, deltas):
    """Pairs of congruent squares whose exact IoU is thr+delta, then
    rigidly rotated (rotation preserves areas, so the target IoU holds up
    to float rounding well inside |delta|)."""
    quads, metas = [], []
    side = 10.0
    for delta in deltas:
        t = thr + delta
        inter = 2 * side * side * t / (1.0 + t)
        dx = side - inter / side
        a = np.array([0, 0, side, 0, side, side, 0, side], np.float64)
        b = a.copy()
        b[0::2] += dx
        ang = rng.rand() * np.pi
        c, s = np.cos(ang), np.sin(ang)
        rot = np.array([[c, s], [-s, c]])
        off = rng.rand(2) * 300 + 100
        qa = (a.reshape(4, 2) @ rot + off).reshape(-1)
        qb = (b.reshape(4, 2) @ rot + off).reshape(-1)
        quads.append((qa.astype(np.float32), qb.astype(np.float32)))
        metas.append(delta)
    return quads, metas


class TestPolyIouParity:
    """Our IoU implementations vs the compiled reference iou_poly."""

    def test_host_devkit_iou_matches(self, ref_polyiou, rng):
        from orientedreppoints_tpu.devkit.polygon import poly_iou

        quads = _clustered_quads(rng, 48).astype(np.float64)
        for i in range(0, 48, 3):
            for j in range(1, 48, 5):
                want = ref_polyiou(quads[i], quads[j])
                got = poly_iou(quads[i], quads[j])
                assert abs(got - want) < 1e-9, (i, j, got, want)

    def test_device_quad_iou_matches(self, ref_polyiou, rng):
        from orientedreppoints_tpu.ops.geometry import quad_iou_matrix

        quads = _clustered_quads(rng, 40)
        got = np.asarray(
            quad_iou_matrix(jnp.asarray(quads), jnp.asarray(quads))
        )
        want = np.array(
            [[ref_polyiou(a, b) for b in quads] for a in quads]
        )
        np.testing.assert_allclose(got, want, atol=5e-4)

    def test_pallas_over_mask_matches(self, ref_polyiou, rng):
        """The fused over-mask kernel's IoU>thr decisions (the bits the
        NMS scan actually consumes) vs the reference IoU values."""
        from orientedreppoints_tpu.ops.pallas_quad_iou import (
            quad_iou_matrix_pallas,
        )

        quads = _clustered_quads(rng, 40)
        got = np.asarray(
            quad_iou_matrix_pallas(jnp.asarray(quads), jnp.asarray(quads))
        )
        want = np.array(
            [[ref_polyiou(a, b) for b in quads] for a in quads]
        )
        np.testing.assert_allclose(got, want, atol=5e-4)

    def test_degenerate_probes(self, ref_polyiou):
        from orientedreppoints_tpu.devkit.polygon import poly_iou

        sq = np.array([0, 0, 10, 0, 10, 10, 0, 10], np.float64)
        inner = np.array([2, 2, 8, 2, 8, 8, 2, 8], np.float64)
        far = sq + 100.0
        touching = sq + np.array([10, 0] * 4, np.float64)
        for a, b in [(sq, sq), (sq, inner), (sq, far), (sq, touching)]:
            want = ref_polyiou(a, b)
            got = poly_iou(a, b)
            assert abs(got - want) < 1e-9, (a, b, got, want)
        assert abs(ref_polyiou(sq, sq) - 1.0) < 1e-12
        assert ref_polyiou(sq, far) == 0.0


def _ref_hard_rnms_keep(ref_rnms, dets9, thr):
    """Reference hard rotated NMS keep indices (selection order) via the
    compiled soft_rnms with method=0 (original NMS) and min_score ~ 0 —
    the same `ovr > threshold` rule as rnms_kernel.cu:131-147."""
    res = ref_rnms.soft_rnms(
        torch.from_numpy(np.ascontiguousarray(dets9, np.float32)),
        float(thr), 0, 0.5, 1e-9,
    )
    return res[:, 9].numpy().astype(np.int64)


class TestRnmsKeepParity:
    def test_random_clusters_exact_keep_set(self, ref_rnms, rng):
        from orientedreppoints_tpu.ops.nms import rotated_nms_mask

        for trial in range(4):
            n = 96
            quads = _clustered_quads(rng, n)
            scores = (rng.permutation(n).astype(np.float32) + 1.0) / (n + 1)
            dets9 = np.concatenate([quads, scores[:, None]], 1)
            want = set(_ref_hard_rnms_keep(ref_rnms, dets9, 0.4).tolist())
            keep = np.asarray(
                rotated_nms_mask(jnp.asarray(quads), jnp.asarray(scores),
                                 0.4)
            )
            got = set(np.nonzero(keep)[0].tolist())
            assert got == want, (trial, sorted(got) , sorted(want))

    def test_near_threshold_adversarial(self, ref_rnms, rng):
        from orientedreppoints_tpu.ops.nms import rotated_nms_mask

        thr = 0.4
        pairs, deltas = _near_threshold_pairs(
            rng, thr, [-1e-2, -1e-3, 1e-3, 1e-2] * 4
        )
        for (qa, qb), delta in zip(pairs, deltas):
            quads = np.stack([qa, qb])
            scores = np.array([0.9, 0.8], np.float32)
            dets9 = np.concatenate([quads, scores[:, None]], 1)
            want = set(_ref_hard_rnms_keep(ref_rnms, dets9, thr).tolist())
            keep = np.asarray(
                rotated_nms_mask(jnp.asarray(quads), jnp.asarray(scores),
                                 thr)
            )
            got = set(np.nonzero(keep)[0].tolist())
            assert got == want, (delta, got, want)
            # sanity: the sign of delta decides suppression
            assert (1 in got) == (delta < 0), (delta, got)

    def test_soft_rnms_gaussian_matches(self, ref_rnms, rng):
        """Our device soft_rnms vs the compiled reference kernel
        (gaussian decay, the reference's soft path)."""
        from orientedreppoints_tpu.ops.nms import soft_rnms

        n = 48
        quads = _clustered_quads(rng, n)
        scores = (rng.permutation(n).astype(np.float32) + 1.0) / (n + 1)
        dets9 = np.concatenate([quads, scores[:, None]], 1)
        res = ref_rnms.soft_rnms(
            torch.from_numpy(dets9.copy()), 0.3, 2, 0.5, 1e-3
        ).numpy()
        want_keep = set(res[:, 9].astype(np.int64).tolist())
        want_scores = {int(i): s for i, s in zip(res[:, 9], res[:, 8])}
        got_scores, got_keep = soft_rnms(
            jnp.asarray(quads), jnp.asarray(scores),
            iou_thr=0.3, sigma=0.5, min_score=1e-3, method="gaussian",
        )
        got_scores = np.asarray(got_scores)
        got_set = set(np.nonzero(np.asarray(got_keep))[0].tolist())
        assert got_set == want_keep
        for i in got_set:
            assert abs(got_scores[i] - want_scores[i]) < 2e-4, (
                i, got_scores[i], want_scores[i])


class TestHbbNmsParity:
    def test_hard_nms_exact_keep_set(self, ref_nms, rng):
        from orientedreppoints_tpu.ops.nms import nms_hbb

        for trial in range(4):
            n = 80
            xy = rng.rand(n, 2) * 200
            wh = rng.rand(n, 2) * 80 + 5
            boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
            scores = (rng.permutation(n).astype(np.float32) + 1.0) / (n + 1)
            dets = np.concatenate([boxes, scores[:, None]], 1)
            want = set(
                ref_nms.nms(torch.from_numpy(dets.copy()), 0.5)
                .numpy().tolist()
            )
            keep = np.asarray(
                nms_hbb(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
            )
            got = set(np.nonzero(keep)[0].tolist())
            assert got == want, trial

    def test_soft_nms_matches(self, ref_nms, rng):
        from orientedreppoints_tpu.ops.nms import soft_nms_hbb

        for method_name, method_code in (("linear", 1), ("gaussian", 2)):
            n = 60
            xy = rng.rand(n, 2) * 150
            wh = rng.rand(n, 2) * 60 + 10
            boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
            scores = (rng.permutation(n).astype(np.float32) + 1.0) / (n + 1)
            dets = np.concatenate([boxes, scores[:, None]], 1)
            res = ref_nms.soft_nms(
                torch.from_numpy(dets.copy()), 0.3, method_code, 0.5, 1e-3
            ).numpy()
            want_keep = set(res[:, 5].astype(np.int64).tolist())
            want_scores = {int(i): s for i, s in zip(res[:, 5], res[:, 4])}
            got_scores, got_keep = soft_nms_hbb(
                jnp.asarray(boxes), jnp.asarray(scores), method=method_name
            )
            got_scores = np.asarray(got_scores)
            got_set = set(np.nonzero(np.asarray(got_keep))[0].tolist())
            assert got_set == want_keep, method_name
            for i in got_set:
                assert abs(got_scores[i] - want_scores[i]) < 2e-4


@pytest.fixture(scope="module")
def ref_bbox_nms(ref_rnms):
    """Load the reference multiclass_rnms (bbox_nms.py) with its
    nms_wrapper import backed by the COMPILED rnms_cpu kernel — the
    reference's own Python plumbing plus its own native suppression."""
    saved = dict(sys.modules)
    try:
        def _pkg(fullname):
            m = types.ModuleType(fullname)
            m.__path__ = []
            sys.modules[fullname] = m
            return m

        _pkg("mmdet")
        ops = _pkg("mmdet.ops")
        nmsm = _pkg("mmdet.ops.nms")
        wrapper = types.ModuleType("mmdet.ops.nms.nms_wrapper")

        def rnms(dets, iou_thr):
            res = ref_rnms.soft_rnms(
                dets.detach().clone(), float(iou_thr), 0, 0.5, 1e-9
            )
            inds = res[:, 9].to(torch.long)
            return dets[inds, :], inds

        wrapper.rnms = rnms
        sys.modules["mmdet.ops.nms.nms_wrapper"] = wrapper
        nmsm.nms_wrapper = wrapper
        ops.nms = nmsm

        import importlib.util

        path = osp.join(REF, "mmdet/core/post_processing/bbox_nms.py")
        spec = importlib.util.spec_from_file_location("ref_bbox_nms", path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules["ref_bbox_nms"] = mod
        spec.loader.exec_module(mod)
        yield mod
    finally:
        _restore_sys_modules(saved)


class TestMulticlassRnmsParity:
    """multiclass_rnms end-to-end vs the reference bbox_nms.py:93-182
    executed with the compiled rnms_cpu op."""

    def _fixtures(self, rng, n=120, nc=5):
        quads = _clustered_quads(rng, n)
        scores = rng.rand(n, nc + 1).astype(np.float32) * 0.9
        scores[:, 0] = 0.0  # background column, ignored by both sides
        return quads, scores

    def _run_ref(self, ref_bbox_nms, quads, scores, score_thr, iou_thr,
                 max_num, reppoints=None):
        kwargs = {}
        if reppoints is not None:
            kwargs["multi_reppoints"] = torch.from_numpy(reppoints)
        dets, labels = ref_bbox_nms.multiclass_rnms(
            torch.from_numpy(quads), torch.from_numpy(scores),
            score_thr, dict(type="rnms", iou_thr=iou_thr), max_num,
            **kwargs,
        )
        return dets.numpy(), labels.numpy()

    def test_end_to_end_matches(self, ref_bbox_nms, rng):
        from orientedreppoints_tpu.ops.nms import multiclass_rnms

        quads, scores = self._fixtures(rng)
        score_thr, iou_thr, max_num = 0.05, 0.4, 50
        want_dets, want_labels = self._run_ref(
            ref_bbox_nms, quads, scores, score_thr, iou_thr, max_num)
        dets, labels, valid = multiclass_rnms(
            jnp.asarray(quads), jnp.asarray(scores), score_thr, iou_thr,
            max_num,
        )
        dets, labels, valid = map(np.asarray, (dets, labels, valid))
        k = int(valid.sum())
        assert valid[:k].all() and not valid[k:].any()
        assert k == len(want_dets)
        np.testing.assert_allclose(dets[:k, :8], want_dets[:, :8],
                                   rtol=1e-6)
        np.testing.assert_allclose(dets[:k, 8], want_dets[:, 8], rtol=1e-6)
        np.testing.assert_array_equal(labels[:k], want_labels)

    def test_end_to_end_with_reppoints(self, ref_bbox_nms, rng):
        from orientedreppoints_tpu.ops.nms import multiclass_rnms

        quads, scores = self._fixtures(rng, n=80)
        pts = rng.rand(80, 18).astype(np.float32) * 500
        score_thr, iou_thr, max_num = 0.05, 0.4, 40
        want_dets, want_labels = self._run_ref(
            ref_bbox_nms, quads, scores, score_thr, iou_thr, max_num,
            reppoints=pts)
        dets, labels, valid = multiclass_rnms(
            jnp.asarray(quads), jnp.asarray(scores), score_thr, iou_thr,
            max_num, reppoints=jnp.asarray(pts),
        )
        dets, labels, valid = map(np.asarray, (dets, labels, valid))
        k = int(valid.sum())
        assert k == len(want_dets)
        # reference layout: [reppoints(18), poly(8), score]
        np.testing.assert_allclose(dets[:k], want_dets, rtol=1e-6)
        np.testing.assert_array_equal(labels[:k], want_labels)

    def test_high_threshold_empty(self, ref_bbox_nms, rng):
        from orientedreppoints_tpu.ops.nms import multiclass_rnms

        quads, scores = self._fixtures(rng, n=30)
        want_dets, want_labels = self._run_ref(
            ref_bbox_nms, quads, scores, 0.99, 0.4, 20)
        dets, labels, valid = multiclass_rnms(
            jnp.asarray(quads), jnp.asarray(scores), 0.99, 0.4, 20,
        )
        assert len(want_dets) == 0
        assert int(np.asarray(valid).sum()) == 0
