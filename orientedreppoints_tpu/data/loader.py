"""Batch loader: aspect-grouped sampling, fixed-canvas padding, gt padding.

The reference uses torch DataLoader workers + GroupSampler
(mmdet/datasets/loader/{build_loader,sampler}.py) with per-batch dynamic
pad shapes.  TPU/XLA needs static shapes, so batches are padded onto a
fixed canvas (or the smallest fitting bucket from `canvas_buckets`) and gt
arrays onto MAX_GT rows; a background thread prefetches ahead of the device.

Emitted batch dict (matching parallel/train.make_train_step):
  images (B, H, W, 3) f32, gt_polys (B, G, 8), gt_labels (B, G) int32,
  gt_valid (B, G) bool, img_hw (B, 2) int32 true (unpadded) sizes.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Sequence

import numpy as np


class GroupedBatchSampler:
    """Shuffled batches keeping one aspect-ratio group per batch
    (mmdet GroupSampler semantics: sampler.py:37-77)."""

    def __init__(self, flags: np.ndarray, batch_size: int, seed: int = 0):
        self.flags = np.asarray(flags)
        self.batch_size = batch_size
        self.rng = np.random.RandomState(seed)

    def __iter__(self):
        batches = []
        for g in np.unique(self.flags):
            idxs = np.where(self.flags == g)[0]
            self.rng.shuffle(idxs)
            pad = (-len(idxs)) % self.batch_size
            if pad:
                idxs = np.concatenate([idxs, idxs[:pad]])
            batches.extend(
                idxs[i : i + self.batch_size]
                for i in range(0, len(idxs), self.batch_size)
            )
        order = self.rng.permutation(len(batches))
        for i in order:
            yield batches[i]

    def __len__(self):
        out = 0
        for g in np.unique(self.flags):
            n = int((self.flags == g).sum())
            out += (n + self.batch_size - 1) // self.batch_size
        return out


def pick_canvas(h, w, buckets):
    for bh, bw in buckets:
        if h <= bh and w <= bw:
            return bh, bw
    return buckets[-1]


def collate(
    samples: Sequence[dict],
    canvas: tuple[int, int],
    max_gt: int,
):
    b = len(samples)
    ch, cw = canvas
    # raw uint8 canvases (device-side Normalize) stay uint8 through
    # collation so the H2D transfer ships 1 byte/px instead of 4
    img_dtype = (np.uint8 if all(s["img"].dtype == np.uint8
                                 for s in samples) else np.float32)
    images = np.zeros((b, ch, cw, 3), img_dtype)
    gt_polys = np.zeros((b, max_gt, 8), np.float32)
    gt_labels = np.zeros((b, max_gt), np.int32)
    gt_valid = np.zeros((b, max_gt), bool)
    img_hw = np.zeros((b, 2), np.int32)
    for i, s in enumerate(samples):
        img = s["img"]
        h, w = img.shape[:2]
        if h > ch or w > cw:  # canvas overflow: center-crop (shouldn't happen)
            img = img[:ch, :cw]
            h, w = img.shape[:2]
        images[i, :h, :w] = img
        img_hw[i] = (s["img_shape"][0], s["img_shape"][1])
        polys = s.get("gt_bboxes", np.zeros((0, 8), np.float32))
        labels = s.get("gt_labels", np.zeros((0,), np.int64))
        n = min(len(polys), max_gt)
        gt_polys[i, :n] = polys[:n]
        gt_labels[i, :n] = labels[:n]
        gt_valid[i, :n] = True
    return dict(
        images=images, gt_polys=gt_polys, gt_labels=gt_labels,
        gt_valid=gt_valid, img_hw=img_hw,
    )


class DataLoader:
    """Simple prefetching loader over a dataset + pipeline."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        canvas_buckets: Sequence[tuple[int, int]] = ((1344, 1344),),
        max_gt: int = 512,
        seed: int = 0,
        prefetch: int = 2,
        drop_empty: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.canvas_buckets = [tuple(c) for c in canvas_buckets]
        self.max_gt = max_gt
        self.seed = seed
        self.prefetch = prefetch
        self.drop_empty = drop_empty
        self.epoch = 0

    def _iter_epoch(self) -> Iterator[dict]:
        sampler = GroupedBatchSampler(
            self.dataset.flag, self.batch_size, seed=self.seed + self.epoch
        )
        for batch_idx in sampler:
            samples = []
            for i in batch_idx:
                s = self.dataset[int(i)]
                if s is None:
                    continue
                samples.append(s)
            if not samples:
                continue
            hmax = max(s["img"].shape[0] for s in samples)
            wmax = max(s["img"].shape[1] for s in samples)
            canvas = pick_canvas(hmax, wmax, self.canvas_buckets)
            yield collate(samples, canvas, self.max_gt)

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop_evt = threading.Event()
        end = object()
        errors: list[BaseException] = []

        def put_until(item) -> bool:
            """Put with shutdown polling; False if the consumer is gone."""
            while not stop_evt.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for b in self._iter_epoch():
                    if not put_until(b):
                        return
            except BaseException as e:  # surface in the consumer
                errors.append(e)
            finally:
                put_until(end)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is end:
                    break
                yield item
        finally:
            # consumer may abandon the iterator mid-epoch (max_iters break);
            # unblock + join the worker so no thread outlives the epoch
            stop_evt.set()
            try:
                while not q.empty():
                    q.get_nowait()
            except BaseException:
                # queue.Empty, or module teardown when a generator is
                # GC'd at interpreter shutdown (names already cleared)
                pass
            t.join(timeout=10.0)
            self.epoch += 1
            if errors:
                raise errors[0]

    def __len__(self):
        return len(
            GroupedBatchSampler(self.dataset.flag, self.batch_size)
        )
