"""Dataset preparation entry points.

Reference parity:
  * prepare_dota1_train_val.py:17-70 — single-scale prep: split train+val
    with gap 200 / subsize 1024 into trainval_split, test with
    SplitOnlyImage, then DOTA2COCO json;
  * prepare_dota1_ms.py:16-80 — multiscale prep: rates (0.5, 1.0, 1.5),
    gap 500 multiscale / 824 single-scale;
  * prepare_hrsc2016.py — HRSC2016 XML -> DOTA txt -> COCO json.
"""

from __future__ import annotations

import os
import os.path as osp

from .dota2coco import dota2coco_test, dota2coco_train
from .img_split import ImgSplit, SplitOnlyImage


def prepare_dota1_train_val(
    data_root: str,
    out_root: str,
    gap: int = 200,
    subsize: int = 1024,
    rates=(1.0,),
    num_process: int = 8,
):
    """Single-scale DOTA-v1.0 preparation (prepare_dota1_train_val.py)."""
    trainval_out = osp.join(out_root, "trainval_split")
    test_out = osp.join(out_root, "test_split")
    os.makedirs(trainval_out, exist_ok=True)
    os.makedirs(test_out, exist_ok=True)
    for split in ("train", "val"):
        src = osp.join(data_root, split)
        if not osp.isdir(src):
            continue
        s = ImgSplit(src, trainval_out, gap=gap, subsize=subsize,
                     num_process=num_process)
        for r in rates:
            s.splitdata(r)
    test_src = osp.join(data_root, "test")
    if osp.isdir(test_src):
        s = SplitOnlyImage(test_src, test_out, gap=gap, subsize=subsize,
                           num_process=num_process)
        for r in rates:
            s.splitdata(r)
    dota2coco_train(trainval_out, osp.join(trainval_out, "trainval_dota.json"))
    if osp.isdir(test_src):
        dota2coco_test(test_out, osp.join(test_out, "test_dota.json"))
    return trainval_out, test_out


def prepare_dota1_ms(
    data_root: str,
    out_root: str,
    gap_ss: int = 824,
    gap_ms: int = 500,
    subsize: int = 1024,
    ms_rates=(0.5, 1.0, 1.5),
    num_process: int = 8,
):
    """Multiscale DOTA-v1.0 preparation (prepare_dota1_ms.py):
    single-scale split at gap 824 plus multiscale splits at gap 500."""
    trainval_out = osp.join(out_root, "trainval_split_ms")
    test_out = osp.join(out_root, "test_split_ms")
    os.makedirs(trainval_out, exist_ok=True)
    os.makedirs(test_out, exist_ok=True)
    for split in ("train", "val"):
        src = osp.join(data_root, split)
        if not osp.isdir(src):
            continue
        ImgSplit(src, trainval_out, gap=gap_ss, subsize=subsize,
                 num_process=num_process).splitdata(1.0)
        s = ImgSplit(src, trainval_out, gap=gap_ms, subsize=subsize,
                     num_process=num_process)
        for r in ms_rates:
            if r != 1.0:
                s.splitdata(r)
    test_src = osp.join(data_root, "test")
    if osp.isdir(test_src):
        SplitOnlyImage(test_src, test_out, gap=gap_ss, subsize=subsize,
                       num_process=num_process).splitdata(1.0)
        s = SplitOnlyImage(test_src, test_out, gap=gap_ms, subsize=subsize,
                           num_process=num_process)
        for r in ms_rates:
            if r != 1.0:
                s.splitdata(r)
    dota2coco_train(trainval_out, osp.join(trainval_out, "trainval_dota.json"))
    if osp.isdir(test_src):
        dota2coco_test(test_out, osp.join(test_out, "test_dota.json"))
    return trainval_out, test_out
