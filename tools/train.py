#!/usr/bin/env python
"""Train an oriented detector (TPU data-parallel).

CLI surface mirrors the reference tools/train.py:23-64 (config, work_dir,
resume_from, seed, deterministic) with TPU-native replacements for the
launcher flags (SPMD over the local mesh — no torch.distributed.launch).
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
# overrides the JAX_PLATFORMS env var); same contract as
# tools/synth_benchmark.py
if os.environ.get("ORP_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["ORP_PLATFORM"])
if os.environ.get("ORP_JAX_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["ORP_JAX_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from orientedreppoints_tpu.parallel import (
    TrainState, build_optimizer, lr_schedule, make_train_step,
)
from orientedreppoints_tpu.parallel.train import default_frozen_prefixes
from orientedreppoints_tpu.utils import Config, builder, checkpoint, chunked


def parse_args():
    p = argparse.ArgumentParser(description="Train a detector")
    p.add_argument("config")
    p.add_argument("--work_dir")
    p.add_argument("--resume_from")
    p.add_argument("--load_from")
    p.add_argument("--pretrained_backbone", help="local torchvision .pth")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--total_epochs", type=int)
    p.add_argument("--max_iters", type=int, help="debug: stop early")
    p.add_argument("--log_interval", type=int, default=50)
    p.add_argument("--validate", action="store_true",
                   help="run the EvalHook-equivalent per-epoch val mAP")
    p.add_argument("--val_max_images", type=int, default=500)
    p.add_argument("--rss_limit_gb", type=float, default=60.0,
                   help="auto-chunking: at an epoch boundary with host RSS "
                        "past this, re-exec with --resume_from <ckpt_dir> "
                        "(utils/chunked.py) — one-command long runs despite "
                        "the axon H2D host-RSS leak; <=0 disables")
    return p.parse_args()


def main():
    args = parse_args()
    # multi-host pod support (tools/dist_train.sh): one process per host,
    # joined via the JAX coordinator (the NCCL init_dist analogue)
    if os.environ.get("ORP_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["ORP_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["ORP_NUM_PROCESSES"]),
            process_id=int(os.environ["ORP_PROCESS_ID"]),
        )
    cfg = Config.fromfile(args.config)
    work_dir = args.work_dir or cfg.get("work_dir", "work_dirs/default")
    os.makedirs(work_dir, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
        handlers=[
            logging.StreamHandler(),
            logging.FileHandler(osp.join(work_dir, "train.log")),
        ],
        # jax/absl install a root handler at import time; without
        # force=True this call is a no-op and INFO logs are swallowed
        force=True,
    )
    log = logging.getLogger("train")
    # env report at train start (reference collect_env parity,
    # mmdet/utils/collect_env.py logged from tools/train.py)
    from orientedreppoints_tpu.utils import env_info_str

    log.info("Environment info:\n%s", env_info_str())

    tpu = cfg.get("tpu", {})
    model = builder.build_detector(cfg, tpu.get("compute_dtype", "bfloat16"))
    loss_cfg = builder.build_loss_config(cfg)
    img_norm = builder.build_img_norm(cfg)
    dataset = builder.build_dataset(cfg.data["train"],
                                    device_normalize=img_norm is not None)
    loader = builder.build_dataloader(dataset, cfg)
    iters_per_epoch = max(len(loader), 1)
    total_epochs = args.total_epochs or cfg.total_epochs
    log.info("dataset: %d imgs, %d iters/epoch", len(dataset), iters_per_epoch)

    canvas = tpu.get("canvas_buckets", [(1344, 1344)])[-1]
    rng = jax.random.PRNGKey(args.seed)
    init_imgs = jnp.zeros((1, canvas[0], canvas[1], 3), jnp.float32)
    variables = jax.jit(model.init)(rng, init_imgs)
    if args.pretrained_backbone:
        variables = checkpoint.load_pretrained_backbone(
            variables, args.pretrained_backbone,
            cfg.model["backbone"].get("depth", 50),
        )
        log.info("loaded pretrained backbone from %s", args.pretrained_backbone)

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
    start_epoch = 0
    if args.resume_from:
        state, step = checkpoint.load_checkpoint(args.resume_from, state)
        start_epoch = int(step)
        log.info("resumed from %s at epoch %d", args.resume_from, start_epoch)

    mesh = Mesh(np.array(jax.devices()), tuple(tpu.get("mesh_axes", ("data",))))
    step_fn = make_train_step(model, loss_cfg, mesh=mesh, img_norm=img_norm)

    ckpt_dir = osp.join(work_dir, "ckpts")
    # run-global iteration: derive from the restored optimizer step so
    # --max_iters and the finish log stay global across auto-chunk re-execs
    # (ADVICE r4 — a fresh `it = 0` made --max_iters per-chunk)
    it = int(state.step)
    for epoch in range(start_epoch, total_epochs):
        t_ep = time.time()
        for batch in loader:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, losses = step_fn(state, batch)
            if it % args.log_interval == 0:
                vals = {k: float(v) for k, v in losses.items()}
                vals["lr"] = float(sched(state.step))
                log.info("epoch %d iter %d %s", epoch, it, json.dumps(
                    {k: round(v, 4) for k, v in vals.items()}))
            it += 1
            if args.max_iters and it >= args.max_iters:
                break
        log.info("epoch %d done in %.1fs", epoch, time.time() - t_ep)
        checkpoint.save_checkpoint(
            ckpt_dir, epoch + 1, state,
            meta=dict(config=cfg.text, classes=dataset.CLASSES),
        )
        if args.validate:  # EvalHook equivalent (eval_hooks.py:7-39)
            from orientedreppoints_tpu.apis import (
                evaluate_results, run_inference,
            )

            val_ds = builder.build_dataset(
                {**cfg.data["val"], "test_mode": True}
            )
            variables_now = {"params": state.params,
                             "batch_stats": state.batch_stats}
            results = run_inference(
                model, variables_now, val_ds, cfg.test_cfg,
                canvas=canvas, max_images=args.val_max_images,
                num_fg=len(val_ds.CLASSES),
            )
            mAP, aps = evaluate_results(results, val_ds)
            log.info("epoch %d val mAP %.4f %s", epoch, mAP,
                     json.dumps({k: round(v, 3) for k, v in aps.items()
                                 if not np.isnan(v)}))
        if args.max_iters and it >= args.max_iters:
            break
        if epoch + 1 < total_epochs:
            # per-epoch checkpoint already saved above -> save_fn is a no-op
            chunked.maybe_reexec(
                args.rss_limit_gb, lambda: None,
                lambda argv: chunked.argv_with_flags(
                    argv, ensure_kv={"--resume_from": ckpt_dir}),
                log=log.info,
            )
    log.info("training finished at iter %d", it)


if __name__ == "__main__":
    main()
