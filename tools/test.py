#!/usr/bin/env python
"""Run inference over a dataset and emit DOTA-format results.

CLI surface mirrors the reference tools/test.py:93+ (config, checkpoint,
--out, --format_task1, --eval) with the pkl replaced by a portable .npz;
tools/parse_pkl's pkl -> Task1-txt conversion is built in via
--format_task1 (devkit.result_merge handles the cross-tile merge).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax

# ORP_PLATFORM=cpu forces CPU even under the axon site hook (which
# overrides the JAX_PLATFORMS env var) — used by the CLI smoke tests and
# for smoke runs while the chip is busy (same contract as
# tools/synth_benchmark.py)
if os.environ.get("ORP_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["ORP_PLATFORM"])
if os.environ.get("ORP_JAX_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["ORP_JAX_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from orientedreppoints_tpu.core.rbox import rbbox2result
from orientedreppoints_tpu.models import decode_detections
from orientedreppoints_tpu.utils import Config, builder, checkpoint


def parse_args():
    p = argparse.ArgumentParser(description="Test a detector")
    p.add_argument("config")
    p.add_argument("--checkpoint", help="orbax checkpoint dir")
    p.add_argument("--out", help="output .npz path for raw results")
    p.add_argument("--format_task1", help="dir for per-class Task1 txts")
    p.add_argument("--merge_dir", help="dir for cross-tile merged txts")
    p.add_argument("--max_images", type=int)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--eval", action="store_true",
                   help="tile-level oriented mAP vs dataset annotations")
    p.add_argument("--flip_tta", action="store_true",
                   help="aug_test: horizontal-flip TTA with merged rnms")
    p.add_argument("--ms_tta",
                   help="comma-separated relative test scales for "
                        "multi-scale TTA, e.g. '0.75,1.0,1.25'; combine "
                        "with --flip_tta to also flip every scale "
                        "(MultiScaleFlipAug parity)")
    return p.parse_args()


def main():
    args = parse_args()
    cfg = Config.fromfile(args.config)
    # force=True: jax/absl already installed a root handler at WARNING by
    # import time, which turns a plain basicConfig into a no-op and
    # swallows every INFO progress line
    logging.basicConfig(level=logging.INFO, force=True)
    log = logging.getLogger("test")

    tpu = cfg.get("tpu", {})
    model = builder.build_detector(cfg, tpu.get("compute_dtype", "bfloat16"))
    dataset = builder.build_dataset({**cfg.data["test"], "test_mode": True})
    tc = cfg.test_cfg
    canvas = tpu.get("canvas_buckets", [(1344, 1344)])[-1]

    # multi-chip: shard the image batch over all local devices
    # (multi_gpu_test equivalent; see parallel/infer.py)
    from orientedreppoints_tpu.parallel import (
        data_mesh, round_up_batch, shard_infer,
    )

    mesh = data_mesh()
    if mesh is not None:
        log.info("data-parallel inference over %d devices", mesh.size)

    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1,) + tuple(canvas) + (3,), jnp.float32)
    )
    if args.checkpoint:
        from orientedreppoints_tpu.utils.checkpoint import load_eval_variables

        variables, step = load_eval_variables(args.checkpoint, dict(variables))
        variables.setdefault("batch_stats", {})
        log.info("loaded checkpoint step %s from %s", step, args.checkpoint)

    def _infer_core(v, imgs, scale_factor):
        outs = model.apply(v, imgs)
        return decode_detections(
            outs,
            nms_pre=tc["nms_pre"],
            score_thr=tc["score_thr"],
            iou_thr=tc["nms"]["iou_thr"],
            max_per_img=tc["max_per_img"],
            pre_nms_cap=tc.get("pre_nms_cap", 4096),
            scale_factor=scale_factor,
        )

    infer = shard_infer(_infer_core, mesh, batch_axes=(0, 0))

    # TTA: shared aug_test path (apis.run_inference_tta — the same code
    # tools/synth_benchmark.py scores the flagship TTA delta with)
    from orientedreppoints_tpu.apis import parse_tta_spec, run_inference_tta

    tta_augs = parse_tta_spec(args.ms_tta, args.flip_tta)

    n = len(dataset) if args.max_images is None else min(
        args.max_images, len(dataset))
    num_fg = len(dataset.CLASSES)
    t0 = time.time()

    if tta_augs is not None:
        log.info("TTA augs: %s", tta_augs)
        results = run_inference_tta(
            model, variables, dataset, tc, tta_augs, canvas=canvas,
            batch_size=args.batch_size, max_images=args.max_images,
            num_fg=num_fg,
        )
        dt = time.time() - t0
        log.info("%d imgs in %.1fs (%.2f img/s)", n, dt, n / max(dt, 1e-9))
        emit_outputs(args, results, dataset, log)
        return

    results = {}
    bs = round_up_batch(args.batch_size, mesh)
    if bs != args.batch_size:
        log.info("batch_size %d -> %d (multiple of %d devices)",
                 args.batch_size, bs, mesh.size)

    def prep_batch(lo):
        """Host side: dataset load + canvas/aug prep for batch at `lo`."""
        idxs = list(range(lo, min(lo + bs, n)))
        imgs, sfs, names = [], [], []
        for i in idxs:
            s = dataset[i]
            img = s["img"]
            canvas_img = np.zeros(tuple(canvas) + (3,), np.float32)
            canvas_img[: img.shape[0], : img.shape[1]] = img
            imgs.append(canvas_img)
            sfs.append(s.get("scale_factor", 1.0))
            names.append(osp.splitext(s["img_info"]["file_name"])[0])
        while len(imgs) < bs:  # pad last batch
            imgs.append(np.zeros_like(imgs[0]))
            sfs.append(1.0)
            names.append(None)
        return np.stack(imgs), np.array(sfs, np.float32), names

    def collect(pending):
        """Fetch a dispatched batch's outputs and bin per-image results."""
        (dets, labels, valid), names = pending
        dets, labels, valid = map(np.asarray, (dets, labels, valid))
        for bi, name in enumerate(names):
            if name is None:
                continue
            keep = valid[bi]
            results[name] = rbbox2result(
                dets[bi][keep][:, -9:], labels[bi][keep], num_fg + 1
            )

    # Software pipeline: JAX dispatch is async, so the device runs batch k
    # while the host preps batch k+1; outputs of batch k are fetched only
    # after batch k+1 is dispatched.  The serialized form pays
    # host_prep + device per batch; this pays ~max(host_prep, device)
    # (TTA_BENCH.json: 112 ms host prep vs 180 ms device at B=2).
    pending = None
    for lo in range(0, n, bs):
        imgs, sfs, names = prep_batch(lo)
        out = infer(
            variables, jnp.asarray(imgs), jnp.asarray(sfs)[:, None, None],
        )
        if pending is not None:
            collect(pending)
        pending = (out, names)
        if lo == 0:
            log.info("first batch done (incl. compile) %.1fs", time.time() - t0)
    if pending is not None:
        collect(pending)
    dt = time.time() - t0
    log.info("%d imgs in %.1fs (%.2f img/s)", n, dt, n / max(dt, 1e-9))
    emit_outputs(args, results, dataset, log)


def emit_outputs(args, results, dataset, log):
    """--out / --eval / --format_task1 handling shared by both paths."""
    if args.out:
        np.savez_compressed(
            args.out,
            **{f"{k}|{ci}": arr for k, per in results.items()
               for ci, arr in enumerate(per)},
        )
        log.info("wrote %s", args.out)

    if args.eval:
        from orientedreppoints_tpu.apis import evaluate_results

        mAP, aps = evaluate_results(results, dataset)
        log.info("tile-level mAP %.4f", mAP)
        for k, v in aps.items():
            if not np.isnan(v):
                log.info("  %s: %.4f", k, v)

    if args.format_task1:
        from orientedreppoints_tpu.devkit.result_merge import (
            merge_by_poly, write_task1_results,
        )

        write_task1_results(results, dataset.CLASSES, args.format_task1)
        log.info("wrote Task1 txts to %s", args.format_task1)
        if args.merge_dir:
            merge_by_poly(args.format_task1, args.merge_dir)
            log.info("merged cross-tile results to %s", args.merge_dir)


if __name__ == "__main__":
    main()
