"""TPU-native Oriented RepPoints framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
OrientedRepPoints (CVPR 2022, reference: LiWentomng/OrientedRepPoints):
oriented (rotated-box) single-stage anchor-free detection for aerial imagery
(DOTA, HRSC2016), with the APAA adaptive point-set assessment/assignment.

Layout:
  ops/       batched fixed-shape oriented-geometry primitives (vmapped XLA +
             Pallas kernels): convex hull, convex IoU/GIoU, min-area-rect,
             point-in-poly, chamfer, rotated NMS, deformable conv
  models/    flax modules: ResNet, Swin, FPN, OrientedRepPointsHead, detector
  core/      assignment (PointAssigner, convex MaxIoUAssigner), point-set
             targets, APAA, losses, rbox transforms, post-processing
  data/      host-side DOTA dataset + polygon-aware augmentation pipeline
  parallel/  pjit/shard_map data-parallel training over a jax Mesh
  train/     train step, LR schedules, optimizer builders, orbax checkpoints
  devkit/    offline DOTA toolkit: ImgSplit, ResultMerge, Task1/mAOE/HRSC eval
  utils/     config system, registry, torch-weight converters
"""

__version__ = "0.1.0"
