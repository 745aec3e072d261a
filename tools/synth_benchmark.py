#!/usr/bin/env python
"""Closed-loop detection-quality benchmark on synthetic DOTA scenes.

Measures real mAP / mAOE numbers through the SAME workflow the reference
uses on real DOTA (reference README "Train/Test" + DOTA_devkit flow):

  render scenes -> ImgSplit tiles -> COCO-poly json -> train on TPU ->
  inference on val tiles -> Task1 txt -> ResultMerge (cross-tile poly NMS)
  -> scene-level Task1 eval (VOC AP over oriented polys) + mAOE.

The val scenes are disjoint from training, so the number measures
generalization, not memorization. Prints one JSON line with the results.

Usage (TPU):
  python tools/synth_benchmark.py --work_dir work_dirs/synth_dota
Iterating (data already generated / model already trained):
  python tools/synth_benchmark.py --skip_gen [--skip_train]
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/dota/synth_r18_512.py")
    p.add_argument("--work_dir", default="work_dirs/synth_dota")
    p.add_argument("--train_scenes", type=int, default=40)
    p.add_argument("--val_scenes", type=int, default=12)
    p.add_argument("--scene_size", type=int, default=768)
    p.add_argument("--n_objects", type=int, default=24)
    p.add_argument("--subsize", type=int, default=512)
    p.add_argument("--gap", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--epochs", type=int, default=None,
                   help="override config total_epochs")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--hard", action="store_true",
                   help="15-class confusable benchmark (clutter, noise, "
                        "dense packing) instead of the easy 6-class one")
    p.add_argument("--hrsc", action="store_true",
                   help="single-class ship scenes; additionally scores the "
                        "merged detections with the HRSC2016 evaluator "
                        "(devkit/hrsc.py eval_hrsc2016, VOC-07)")
    p.add_argument("--skip_gen", action="store_true")
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="resume training from the work_dir checkpoint")
    p.add_argument("--ckpt_interval", type=int, default=10,
                   help="checkpoint every N epochs (crash insurance)")
    p.add_argument("--stop_epoch", type=int, default=0,
                   help="train at most up to this epoch in THIS process, "
                        "checkpoint and exit (rc=3) without evaluating; "
                        "chunked runs bound the axon-runtime host-RSS leak "
                        "(~25 MB/step held per H2D transfer)")
    p.add_argument("--rss_limit_gb", type=float, default=60.0,
                   help="auto-chunking: at an epoch boundary with host RSS "
                        "past this, checkpoint and re-exec with "
                        "--resume --skip_gen (utils/chunked.py) — a long "
                        "run is ONE command despite the axon H2D leak; "
                        "<=0 disables")
    p.add_argument("--log_interval", type=int, default=50)
    p.add_argument("--flip_tta", action="store_true",
                   help="ALSO score a flip-TTA pass of the same checkpoint "
                        "(apis.run_inference_tta) and report the delta")
    p.add_argument("--ms_tta",
                   help="comma-separated relative scales for a multi-scale"
                        "(+flip with --flip_tta) TTA pass, e.g. "
                        "'0.5,1.0,1.5' — the reference 78.11 recipe shape")
    return p.parse_args()


def generate(args):
    from orientedreppoints_tpu.data import synth
    from orientedreppoints_tpu.data.synth import generate_synth_dota
    from orientedreppoints_tpu.devkit.dota2coco import dota2coco_train
    from orientedreppoints_tpu.devkit.img_split import ImgSplit

    wd = args.work_dir
    print("generating scenes ...", flush=True)
    if args.hrsc:
        # ship-only scenes: restrict the easy spec to the ship class for
        # the duration of the generation calls
        ship_specs = {"ship": synth.SYNTH_CLASS_SPECS["ship"]}
        orig_render = synth.render_scene

        def ship_render(rng, **kw):
            kw["specs"] = ship_specs
            return orig_render(rng, **kw)

        synth.render_scene = ship_render
    try:
        generate_synth_dota(
            osp.join(wd, "train_raw"), args.train_scenes,
            size=args.scene_size, n_objects=args.n_objects, seed=args.seed,
            prefix="T", hard=args.hard,
        )
        val_names = generate_synth_dota(
            osp.join(wd, "val_raw"), args.val_scenes, size=args.scene_size,
            n_objects=args.n_objects, seed=args.seed + 10_000, prefix="V",
            hard=args.hard,
        )
    finally:
        if args.hrsc:
            synth.render_scene = orig_render
    print("splitting ...", flush=True)
    for src, dst in (("train_raw", "train_split"), ("val_raw", "val_split")):
        ImgSplit(
            osp.join(wd, src), osp.join(wd, dst), gap=args.gap,
            subsize=args.subsize, num_process=8,
        ).splitdata()
    dota2coco_train(
        osp.join(wd, "train_split"), osp.join(wd, "train_split", "train.json")
    )
    # annotation-BEARING json for the val split (dota2coco_train format):
    # the authoritative score comes from the devkit Task1 eval on labelTxt,
    # but tools/test.py --eval / --validate tile-level eval needs gts in
    # the json (a dota2coco_test json has an empty `annotations` list by
    # DOTA test-split convention and silently scored mAP=0)
    dota2coco_train(
        osp.join(wd, "val_split"), osp.join(wd, "val_split", "test.json")
    )
    return val_names


def train(args, cfg):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from orientedreppoints_tpu.parallel import (
        TrainState, build_optimizer, lr_schedule, make_train_step,
    )
    from orientedreppoints_tpu.parallel.train import default_frozen_prefixes
    from orientedreppoints_tpu.utils import builder, checkpoint, chunked

    tpu = cfg.get("tpu", {})
    model = builder.build_detector(cfg, tpu.get("compute_dtype", "bfloat16"))
    loss_cfg = builder.build_loss_config(cfg)
    img_norm = builder.build_img_norm(cfg)
    dataset = builder.build_dataset(cfg.data["train"],
                                    device_normalize=img_norm is not None)
    loader = builder.build_dataloader(dataset, cfg)
    iters_per_epoch = max(len(loader), 1)
    total_epochs = args.epochs or cfg.total_epochs
    print(f"train: {len(dataset)} tiles, {iters_per_epoch} iters/epoch, "
          f"{total_epochs} epochs", flush=True)

    canvas = tpu.get("canvas_buckets", [(512, 512)])[-1]
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, canvas[0], canvas[1], 3), jnp.float32),
    )
    opt = cfg.optimizer
    sched = lr_schedule(
        base_lr=opt["lr"],
        warmup_iters=cfg.lr_config["warmup_iters"],
        warmup_ratio=cfg.lr_config["warmup_ratio"],
        step_epochs=cfg.lr_config["step"],
        iters_per_epoch=iters_per_epoch,
    )
    frozen = default_frozen_prefixes(
        cfg.model["backbone"].get("frozen_stages", 1)
    )
    tx = build_optimizer(
        variables["params"], sched,
        optimizer=opt["type"].lower(),
        momentum=opt.get("momentum", 0.9),
        weight_decay=opt.get("weight_decay", 1e-4),
        grad_clip=cfg.optimizer_config["grad_clip"]["max_norm"],
        frozen_prefixes=frozen,
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )
    mesh = Mesh(np.array(jax.devices()),
                tuple(tpu.get("mesh_axes", ("data",))))
    step_fn = make_train_step(model, loss_cfg, mesh=mesh,
                              dropout_rng=jax.random.key(args.seed),
                              img_norm=img_norm)

    import gc

    ckpt_dir = osp.join(args.work_dir, "ckpts")
    meta = dict(config=cfg.text, classes=list(dataset.CLASSES))
    start_epoch = 0
    if args.resume:
        state, _ = checkpoint.load_checkpoint(ckpt_dir, state)
        meta_path = osp.join(ckpt_dir, "meta.json")
        if osp.exists(meta_path):
            with open(meta_path) as f:
                start_epoch = int(json.load(f).get("epoch", 0))
        print(f"resumed at epoch {start_epoch}", flush=True)

    # ORP_FEED=numpy passes host arrays straight to the jitted step
    # (transfer at the jit boundary); ORP_SYNC_EVERY=N forces a scalar
    # fetch every N steps to bound in-flight dispatches (leak hunting)
    feed = os.environ.get("ORP_FEED", "jnp")
    sync_every = int(os.environ.get("ORP_SYNC_EVERY", "0"))
    end_epoch = (min(args.stop_epoch, total_epochs) if args.stop_epoch
                 else total_epochs)
    it, t0 = 0, time.time()
    last_saved = None
    for epoch in range(start_epoch, end_epoch):
        for batch in loader:
            if feed == "jnp":
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, losses = step_fn(state, batch)
            if sync_every and it % sync_every == 0:
                float(losses["loss_total"])
            if it % args.log_interval == 0:
                vals = {k: round(float(v), 3) for k, v in losses.items()}
                # current VmRSS, not ru_maxrss: the peak counter survives
                # os.execv so it would mask the auto-chunk reset
                rss = chunked.current_rss_gb()
                print(f"epoch {epoch} iter {it} ({time.time()-t0:.0f}s, "
                      f"rss {rss:.1f}G) {json.dumps(vals)}", flush=True)
                gc.collect()
            it += 1
            if args.max_steps and it >= args.max_steps:
                break
        if (epoch + 1) % args.ckpt_interval == 0:
            checkpoint.save_checkpoint(
                ckpt_dir, epoch + 1, state, meta={**meta, "epoch": epoch + 1})
            last_saved = epoch + 1
        if args.max_steps and it >= args.max_steps:
            break
        if epoch + 1 < end_epoch:

            def _save(ep=epoch + 1):
                if last_saved != ep:
                    checkpoint.save_checkpoint(
                        ckpt_dir, ep, state, meta={**meta, "epoch": ep})

            chunked.maybe_reexec(
                args.rss_limit_gb, _save,
                lambda argv: chunked.argv_with_flags(
                    argv, ensure=["--resume", "--skip_gen"]),
            )
    if last_saved != end_epoch:
        checkpoint.save_checkpoint(
            ckpt_dir, end_epoch, state, meta={**meta, "epoch": end_epoch},
        )
    print(f"training done: {it} iters in {time.time()-t0:.0f}s "
          f"(epochs {start_epoch}..{end_epoch} of {total_epochs})",
          flush=True)
    if end_epoch < total_epochs:
        print("chunk complete; re-invoke with --resume to continue",
              flush=True)
        sys.exit(3)
    return model, {"params": state.params, "batch_stats": state.batch_stats}


def evaluate(args, cfg, model, variables, val_names, tta_augs=None,
             suffix=""):
    from orientedreppoints_tpu.apis import run_inference, run_inference_tta
    from orientedreppoints_tpu.data.synth import (
        SYNTH_CLASS_SPECS, SYNTH_HARD_CLASS_SPECS,
    )
    from orientedreppoints_tpu.devkit.dota_utils import DOTA10_CLASSES
    from orientedreppoints_tpu.devkit.evaluation import (
        eval_dota_task1, eval_maoe,
    )
    from orientedreppoints_tpu.devkit.result_merge import (
        merge_by_poly, write_task1_results,
    )
    from orientedreppoints_tpu.utils import builder

    wd = args.work_dir
    tpu = cfg.get("tpu", {})
    canvas = tuple(tpu.get("canvas_buckets", [(512, 512)])[-1])
    val_ds = builder.build_dataset({**cfg.data["test"], "test_mode": True})
    print(f"inference over {len(val_ds)} val tiles "
          f"(tta={tta_augs}) ...", flush=True)
    t0 = time.time()
    if tta_augs is not None:
        results = run_inference_tta(
            model, variables, val_ds, cfg.test_cfg, tta_augs, canvas=canvas,
            num_fg=len(val_ds.CLASSES),
        )
    else:
        results = run_inference(
            model, variables, val_ds, cfg.test_cfg, canvas=canvas,
            num_fg=len(val_ds.CLASSES),
        )
    print(f"inference done in {time.time()-t0:.0f}s", flush=True)

    raw = osp.join(wd, "task1_raw" + suffix)
    merged = osp.join(wd, "task1_merged" + suffix)
    # num_process=1: jax is initialized in this process and os.fork() from
    # a multithreaded parent can deadlock
    write_task1_results(results, DOTA10_CLASSES, raw)
    merge_by_poly(raw, merged, num_process=1)

    detpath = osp.join(merged, "Task1_{:s}.txt")
    annopath = osp.join(wd, "val_raw", "labelTxt", "{:s}.txt")
    classnames = (
        ["ship"] if args.hrsc
        else list(SYNTH_HARD_CLASS_SPECS if args.hard else SYNTH_CLASS_SPECS)
    )
    mAP, aps = eval_dota_task1(
        detpath, annopath, val_names, classnames=classnames,
        use_07_metric=False,
    )
    # ovthresh=0.7 mirrors the reference's mAOE main() (the published
    # 5.93deg is measured at 0.7); mod90 is the convention-free companion
    # (evaluator near-square flips removed — VERDICT r4 weak #7)
    mAOE, aoes, mAOE_mod90, aoes_mod90 = eval_maoe(
        detpath, annopath, val_names, classnames=classnames, ovthresh=0.7,
        return_mod90=True)
    extra = {}
    if args.hrsc:
        # score the same merged detections with the HRSC2016 evaluator
        # (VOC-07 metric, reference hrsc2016_evaluation.py semantics)
        from orientedreppoints_tpu.devkit.hrsc import eval_hrsc2016

        extra["hrsc_ap07"] = round(float(eval_hrsc2016(
            detpath, annopath, val_names, use_07_metric=True)), 4)
    extra["mAOE_mod90_deg"] = round(mAOE_mod90, 2)
    extra["per_class_aoe_mod90"] = {
        k: round(v, 2) for k, v in aoes_mod90.items()
    }
    return mAP, aps, mAOE, aoes, extra


def main():
    args = parse_args()
    os.makedirs(args.work_dir, exist_ok=True)

    import jax

    # ORP_PLATFORM=cpu forces CPU even under the axon site hook (which
    # overrides the JAX_PLATFORMS env var) — used for smoke runs while
    # the chip is busy
    if os.environ.get("ORP_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ORP_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("ORP_JAX_CACHE",
                                     "/tmp/orp_jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from orientedreppoints_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    cfg.data["train"]["ann_file"] = osp.join(
        args.work_dir, "train_split", "train.json")
    cfg.data["train"]["img_prefix"] = osp.join(
        args.work_dir, "train_split", "images/")
    for split in ("val", "test"):
        cfg.data[split]["ann_file"] = osp.join(
            args.work_dir, "val_split", "test.json")
        cfg.data[split]["img_prefix"] = osp.join(
            args.work_dir, "val_split", "images/")

    if args.skip_gen:
        val_names = sorted(
            osp.splitext(f)[0]
            for f in os.listdir(osp.join(args.work_dir, "val_raw", "images"))
        )
    else:
        val_names = generate(args)

    if args.skip_train:
        from orientedreppoints_tpu.apis import init_detector

        model, variables, _ = init_detector(
            cfg, osp.join(args.work_dir, "ckpts"))
    else:
        model, variables = train(args, cfg)

    mAP, aps, mAOE, aoes, extra = evaluate(args, cfg, model, variables,
                                           val_names)
    out = {
        "metric": ("synth_hrsc_mAP" if args.hrsc
                   else "synth_dota_hard_mAP" if args.hard
                   else "synth_dota_mAP"),
        "mAP": round(mAP, 4),
        "mAOE_deg": round(mAOE, 2),
        "per_class_ap": {k: round(v, 4) for k, v in aps.items()},
        "per_class_aoe": {k: round(v, 2) for k, v in aoes.items()},
        **extra,
    }

    from orientedreppoints_tpu.apis import parse_tta_spec

    tta_augs = parse_tta_spec(args.ms_tta, args.flip_tta)
    if tta_augs is not None:
        # same checkpoint, TTA pass (aug_test parity) — the reference's
        # headline 78.11 is a multi-scale+flip recipe (reference
        # README.md:31 + mmdet/datasets/pipelines/test_aug.py:8)
        mAP_t, aps_t, mAOE_t, _, extra_t = evaluate(
            args, cfg, model, variables, val_names, tta_augs=tta_augs,
            suffix="_tta")
        out["tta"] = {
            "augs": [list(a) for a in tta_augs],
            "mAP": round(mAP_t, 4),
            "mAOE_deg": round(mAOE_t, 2),
            "per_class_ap": {k: round(v, 4) for k, v in aps_t.items()},
            "mAOE_mod90_deg": extra_t.get("mAOE_mod90_deg"),
        }
        out["tta_mAP_delta"] = round(mAP_t - mAP, 4)
    print(json.dumps(out), flush=True)
    with open(osp.join(args.work_dir, "synth_eval.json"), "w") as f:
        json.dump(out, f, indent=2)
    return 0 if mAP > 0.6 else 1


if __name__ == "__main__":
    sys.exit(main())
