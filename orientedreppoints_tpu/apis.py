"""High-level train/inference APIs.

Reference analogues:
  * inference_detector / init_detector (mmdet/apis/inference.py:16,63);
  * single_gpu_test (mmdet/apis/test.py:12) -> run_inference;
  * EvalHook per-epoch validation (core/evaluation/eval_hooks.py) ->
    evaluate_results (in-memory VOC mAP over oriented polys at tile level).
"""

from __future__ import annotations

import os.path as osp
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .core.rbox import rbbox2result
from .devkit.polygon import poly_iou
from .devkit.evaluation import voc_ap
from .models import decode_detections


def init_detector(config, checkpoint_dir: str | None = None,
                  compute_dtype: str = "bfloat16"):
    """Build a detector (+ load weights) from a config path or Config."""
    from .utils import Config, builder

    cfg = Config.fromfile(config) if isinstance(config, str) else config
    model = builder.build_detector(cfg, compute_dtype)
    tpu = cfg.get("tpu", {})
    canvas = tuple(tpu.get("canvas_buckets", [(1344, 1344)])[-1])
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1,) + canvas + (3,), jnp.float32)
    )
    if checkpoint_dir:
        from .utils.checkpoint import load_eval_variables

        variables, _ = load_eval_variables(checkpoint_dir, dict(variables))
        variables.setdefault("batch_stats", {})
    return model, variables, cfg


def run_inference(
    model, variables, dataset, test_cfg, canvas=(1344, 1344),
    batch_size: int = 4, max_images: int | None = None, num_fg: int = 15,
):
    """Inference over a dataset -> {image_name: [per-class (k, 9) arrays]}.

    On multi-device hosts the batch is sharded over all local devices
    (parallel/infer.py, the multi_gpu_test equivalent); single-device
    graphs are unchanged.
    """
    from .parallel import data_mesh, round_up_batch, shard_infer

    mesh = data_mesh()
    batch_size = round_up_batch(batch_size, mesh)

    def _infer_core(v, imgs, scale_factor):
        outs = model.apply(v, imgs)
        return decode_detections(
            outs,
            nms_pre=test_cfg["nms_pre"],
            score_thr=test_cfg["score_thr"],
            iou_thr=test_cfg["nms"]["iou_thr"],
            max_per_img=test_cfg["max_per_img"],
            pre_nms_cap=test_cfg.get("pre_nms_cap", 4096),
            scale_factor=scale_factor,
        )

    infer = shard_infer(_infer_core, mesh, batch_axes=(0, 0))

    n = len(dataset) if max_images is None else min(max_images, len(dataset))
    results = {}
    for lo in range(0, n, batch_size):
        idxs = list(range(lo, min(lo + batch_size, n)))
        imgs, sfs, names = [], [], []
        for i in idxs:
            s = dataset[i]
            img = s["img"]
            c = np.zeros(tuple(canvas) + (3,), np.float32)
            c[: img.shape[0], : img.shape[1]] = img
            imgs.append(c)
            sfs.append(float(np.asarray(s.get("scale_factor", 1.0)).reshape(-1)[0]))
            names.append(osp.splitext(s["img_info"]["file_name"])[0])
        while len(imgs) < batch_size:
            imgs.append(np.zeros_like(imgs[0]))
            sfs.append(1.0)
            names.append(None)
        dets, labels, valid = infer(
            variables, jnp.asarray(np.stack(imgs)),
            jnp.asarray(np.asarray(sfs, np.float32))[:, None, None],
        )
        dets, labels, valid = map(np.asarray, (dets, labels, valid))
        for bi, name in enumerate(names):
            if name is None:
                continue
            keep = valid[bi]
            results[name] = rbbox2result(
                dets[bi][keep][:, -9:], labels[bi][keep], num_fg + 1
            )
    return results


def run_inference_tta(
    model, variables, dataset, test_cfg, tta_augs: Sequence[tuple],
    canvas=(1344, 1344), batch_size: int = 2, max_images: int | None = None,
    num_fg: int = 15,
):
    """Multi-scale/flip TTA inference -> {image_name: [(k, 9) per class]}.

    aug_test parity (reference orientedreppoints_detector.py:111-144 +
    MultiScaleFlipAug, mmdet/datasets/pipelines/test_aug.py:8): decode every
    aug without NMS, map each back into the original frame (unflip in the
    aug frame, undo its scale: rbbox_mapping_back), then one merged rnms.

    tta_augs: list of (relative_scale, flip) pairs, e.g. the reference's
    78.11 recipe shape [(0.5, False), (0.5, True), (1.0, False), ...].
    Host-side canvas prep for batch k+1 overlaps device compute of batch k
    (JAX async dispatch), so the loop pays ~max(host_prep, device) per
    batch (TTA_BENCH.json: 112 ms host vs 180 ms device at B=2).

    Each SCALE runs on its own /32 canvas that its content fills, like the
    reference's native-resolution aug pipeline — one jitted graph per
    scale (flip variants share it).  A single max-scale canvas is NOT
    sound here: at the 0.5x aug the content would cover ~1/9 of the
    canvas and GroupNorm statistics (taken over the full padded extent)
    amplify the content activations ~3x, which measurably corrupts the
    scores (flagship run: 3-scale TTA scored mAP 0.866 vs 0.983 plain;
    storage-tank 0.64, helicopter 0.45).  Per-scale canvases also cost
    0.25+1+2.25 area-units instead of 3 x 2.25.  Per-scale candidate
    counts differ, so each scale's decode is zero-padded to the largest
    N before stacking — zero-score rows fall to the score_thr cut inside
    the merged rnms.  Identity is preserved: a (1.0, False) aug runs on
    exactly the plain-path canvas.
    """
    import cv2

    from .models import decode_no_nms, merge_aug_and_nms
    from .parallel import data_mesh, round_up_batch, shard_infer

    mesh = data_mesh()
    batch_size = round_up_batch(batch_size, mesh)
    num_augs = len(tta_augs)
    ch, cw = tuple(canvas)

    def ceil32(x):
        return int(np.ceil(x / 32.0)) * 32

    # group augs by scale, preserving recipe order inside each group
    scales = list(dict.fromkeys(r for r, _ in tta_augs))
    scale_canvas = {r: (ceil32(ch * r), ceil32(cw * r)) for r in scales}
    scale_augs = {
        r: [(ai, f) for ai, (rr, f) in enumerate(tta_augs) if rr == r]
        for r in scales
    }
    # the flip-unmap frame for each aug is ITS scale's canvas
    aug_shapes = [scale_canvas[r] for r, _ in tta_augs]

    def make_scale_core(r):
        flips = [f for _, f in scale_augs[r]]

        def core(v, imgs):
            """imgs: (B, sh, sw, 3) -> ((B, Af, N_r, 8), (B, Af, N_r, C+1))."""
            bs, ss = [], []
            for flip in flips:
                x = imgs[:, :, ::-1] if flip else imgs
                b_, s_ = decode_no_nms(model.apply(v, x),
                                       nms_pre=test_cfg["nms_pre"])
                bs.append(b_)
                ss.append(s_)
            return jnp.stack(bs, axis=1), jnp.stack(ss, axis=1)

        return shard_infer(core, mesh, batch_axes=(0,))

    scale_infer = {r: make_scale_core(r) for r in scales}

    def merge_core(v, boxes_all, scores_all, sf_augs):
        """boxes_all (B, A, N, 8), scores_all (B, A, N, C+1), sf (B, A)."""

        def per_image(args_):
            bb, ss, sf = args_
            return merge_aug_and_nms(
                [bb[a] for a in range(num_augs)],
                [ss[a] for a in range(num_augs)],
                [f for _, f in tta_augs], aug_shapes,
                [sf[a] for a in range(num_augs)],
                score_thr=test_cfg["score_thr"],
                iou_thr=test_cfg["nms"]["iou_thr"],
                max_per_img=test_cfg["max_per_img"],
                pre_nms_cap=test_cfg.get("pre_nms_cap", 4096),
            )

        return jax.lax.map(per_image, (boxes_all, scores_all, sf_augs))

    merge_infer = shard_infer(merge_core, mesh, batch_axes=(0, 0, 0))

    n = len(dataset) if max_images is None else min(max_images, len(dataset))

    def prep_batch(lo):
        idxs = list(range(lo, min(lo + batch_size, n)))
        imgs, sfs, names = [], [], []
        for i in idxs:
            s = dataset[i]
            img = s["img"]
            c = np.zeros((ch, cw, 3), np.float32)
            c[: img.shape[0], : img.shape[1]] = img
            imgs.append(c)
            sfs.append(
                float(np.asarray(s.get("scale_factor", 1.0)).reshape(-1)[0]))
            names.append(osp.splitext(s["img_info"]["file_name"])[0])
        while len(imgs) < batch_size:
            imgs.append(np.zeros_like(imgs[0]))
            sfs.append(1.0)
            names.append(None)
        bsz = len(imgs)
        scale_imgs = {}
        for r in scales:
            sh, sw = scale_canvas[r]
            arr = np.zeros((bsz, sh, sw, 3), np.float32)
            for bi in range(bsz):
                if r == 1.0:
                    arr[bi, :ch, :cw] = imgs[bi]
                else:
                    rh, rw = int(round(ch * r)), int(round(cw * r))
                    arr[bi, :rh, :rw] = cv2.resize(
                        imgs[bi], (rw, rh), interpolation=cv2.INTER_LINEAR)
            scale_imgs[r] = arr
        sf_augs = np.asarray(
            [[sfs[bi] * r for r, _ in tta_augs] for bi in range(bsz)],
            np.float32)  # (B, A)
        return scale_imgs, sf_augs, names

    results = {}

    def collect(pending):
        (dets, labels, valid), names = pending
        dets, labels, valid = map(np.asarray, (dets, labels, valid))
        for bi, name in enumerate(names):
            if name is None:
                continue
            keep = valid[bi]
            results[name] = rbbox2result(
                dets[bi][keep][:, -9:], labels[bi][keep], num_fg + 1
            )

    pending = None
    for lo in range(0, n, batch_size):
        scale_imgs, sf_augs, names = prep_batch(lo)
        per_aug_boxes = [None] * num_augs
        per_aug_scores = [None] * num_augs
        for r in scales:
            b_r, s_r = scale_infer[r](variables, jnp.asarray(scale_imgs[r]))
            # to host: the pad/stack below stays in numpy (eager dispatch
            # through the axon tunnel is ~0.5 s/op; these are a few MB)
            b_r, s_r = np.asarray(b_r), np.asarray(s_r)
            for slot, (ai, _) in enumerate(scale_augs[r]):
                per_aug_boxes[ai] = b_r[:, slot]
                per_aug_scores[ai] = s_r[:, slot]
        # pad each aug's candidate row count to the recipe-wide max with
        # inert zero-score rows, then stack to (B, A, N, .)
        n_max = max(b.shape[1] for b in per_aug_boxes)

        def pad_rows(x):
            pad = n_max - x.shape[1]
            if pad == 0:
                return x
            return np.concatenate(
                [x, np.zeros((x.shape[0], pad) + x.shape[2:], x.dtype)],
                axis=1)

        boxes_all = np.stack([pad_rows(b) for b in per_aug_boxes], axis=1)
        scores_all = np.stack([pad_rows(s) for s in per_aug_scores], axis=1)
        out = merge_infer(variables, jnp.asarray(boxes_all),
                          jnp.asarray(scores_all), jnp.asarray(sf_augs))
        if pending is not None:
            collect(pending)
        pending = (out, names)
    if pending is not None:
        collect(pending)
    return results


def parse_tta_spec(ms_tta: str | None, flip_tta: bool):
    """CLI TTA flags -> [(relative_scale, flip)] aug list or None.

    MultiScaleFlipAug parity: every scale, optionally x both orientations.
    """
    if ms_tta:
        scales = [float(s) for s in ms_tta.split(",")]
        flips = (False, True) if flip_tta else (False,)
        return [(r, f) for r in scales for f in flips]
    if flip_tta:
        return [(1.0, False), (1.0, True)]
    return None


def evaluate_results(results: dict, dataset, iou_thr: float = 0.5,
                     use_07_metric: bool = True):
    """In-memory tile-level oriented mAP against the dataset annotations.

    The EvalHook analogue: no files, exact polygon IoU, VOC AP per class.
    Matching mirrors the authoritative devkit evaluator
    (devkit/evaluation.py voc_eval_poly): HBB-IoU prefilter before the
    exact polygon IoU, and VOC difficult semantics — difficult gts are
    excluded from npos and detections matching them count as neither TP
    nor FP. Returns (mAP, {class: ap}).
    """
    from .devkit.evaluation import _hbb_iou_prefilter

    name_to_idx = {
        osp.splitext(info["file_name"])[0]: i
        for i, info in enumerate(dataset.img_infos)
    }
    # score ONLY the images that were actually inferred: a capped/subset
    # run (EvalHook max_images, tools/test_robustness.py) must not count
    # the un-inferred tiles' gts as misses — that silently dilutes mAP by
    # the subset fraction
    name_to_idx = {n: i for n, i in name_to_idx.items() if n in results}
    aps = {}
    for ci, cname in enumerate(dataset.CLASSES):
        # gather gt
        gt = {}
        npos = 0
        for name, di in name_to_idx.items():
            ann = dataset.anns[di]
            mask = ann["labels"] == (ci + 1)
            boxes = ann["bboxes"][mask]
            difficult = np.asarray(
                ann.get("difficult", np.zeros(len(ann["labels"])))
            )[mask].astype(bool)
            gt[name] = dict(bbox=boxes, difficult=difficult,
                            det=[False] * len(boxes))
            npos += int((~difficult).sum())
        # gather dets
        recs = []
        for name, per_class in results.items():
            if name not in name_to_idx:
                continue
            for row in np.asarray(per_class[ci]).reshape(-1, 9):
                recs.append((name, row[8], row[:8]))
        if not recs or npos == 0:
            aps[cname] = 0.0 if npos > 0 else float("nan")
            continue
        recs.sort(key=lambda r: -r[1])
        tp = np.zeros(len(recs))
        fp = np.zeros(len(recs))
        for d, (name, score, poly) in enumerate(recs):
            R = gt[name]
            ovmax, jmax = -np.inf, -1
            gts = R["bbox"]
            if gts.size > 0:
                cand = np.where(
                    _hbb_iou_prefilter(gts.astype(np.float64),
                                       poly.astype(np.float64)) > 0
                )[0]
                overlaps = np.array(
                    [poly_iou(gts[j], poly) for j in cand], np.float64
                )
                if overlaps.size > 0:
                    k = int(np.argmax(overlaps))
                    ovmax, jmax = overlaps[k], int(cand[k])
            if ovmax > iou_thr:
                if not R["difficult"][jmax]:
                    if not R["det"][jmax]:
                        tp[d] = 1
                        R["det"][jmax] = True
                    else:
                        fp[d] = 1
                # difficult match: neither tp nor fp (VOC semantics)
            else:
                fp[d] = 1
        fp = np.cumsum(fp)
        tp = np.cumsum(tp)
        rec = tp / max(npos, 1)
        prec = tp / np.maximum(tp + fp, 1e-9)
        aps[cname] = voc_ap(rec, prec, use_07_metric)
    valid_aps = [v for v in aps.values() if not np.isnan(v)]
    if not valid_aps:
        # Every class has npos==0: the dataset carries no annotations at
        # all (e.g. a test-split COCO json written by dota2coco_test,
        # which by DOTA convention has an empty `annotations` list).
        # A silent 0.0 here once masked a working model as mAP=0 —
        # fail loudly instead.
        raise ValueError(
            "evaluate_results: no ground-truth annotations in the dataset "
            "(all classes have npos==0). Tile-level eval needs an "
            "annotation-bearing json (dota2coco_train output); DOTA "
            "test-split jsons contain no annotations — evaluate those "
            "with the devkit Task1 evaluator against labelTxt instead."
        )
    return float(np.mean(valid_aps)), aps
