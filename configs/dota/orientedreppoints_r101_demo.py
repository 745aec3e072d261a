# OrientedRepPoints R-101 + FPN (76.52 mAP recipe).
# Same as the R-50 demo with depth=101
# (reference: configs/dota/orientedrepoints_r101_demo.py).

import os.path as osp

_base = osp.join(osp.dirname(osp.abspath(__file__)),
                 "orientedreppoints_r50_demo.py")
exec(compile(open(_base).read(), _base, "exec"))

model["backbone"]["depth"] = 101  # noqa: F821
work_dir = "work_dirs/orientedreppoints_r101_demo/"
