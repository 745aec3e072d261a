#!/usr/bin/env python
"""Analyze training logs: loss curves and time stats.

Reference analogue: tools/analyze_logs.py (json-log curves / train-time).
Our tools/train.py emits lines 'epoch E iter I {json}', parsed here.
"""

from __future__ import annotations

import argparse
import json
import re

LINE = re.compile(r"epoch (\d+) iter (\d+) (\{.*\})")
EPOCH = re.compile(r"epoch (\d+) done in ([0-9.]+)s")


def parse_log(path: str):
    iters, epochs = [], []
    with open(path) as f:
        for line in f:
            m = LINE.search(line)
            if m:
                rec = json.loads(m.group(3))
                rec["epoch"] = int(m.group(1))
                rec["iter"] = int(m.group(2))
                iters.append(rec)
            m = EPOCH.search(line)
            if m:
                epochs.append((int(m.group(1)), float(m.group(2))))
    return iters, epochs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("log", help="train.log path")
    p.add_argument("--keys", nargs="+", default=["loss_total"])
    p.add_argument("--plot", help="optional output png")
    args = p.parse_args()
    iters, epochs = parse_log(args.log)
    if not iters:
        print("no iteration records found")
        return
    for k in args.keys:
        vals = [r[k] for r in iters if k in r]
        if vals:
            print(
                f"{k}: first={vals[0]:.4f} last={vals[-1]:.4f} "
                f"min={min(vals):.4f} mean={sum(vals)/len(vals):.4f}"
            )
    if epochs:
        times = [t for _, t in epochs]
        print(
            f"epoch time: mean {sum(times)/len(times):.1f}s "
            f"min {min(times):.1f}s max {max(times):.1f}s over {len(times)} epochs"
        )
    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        for k in args.keys:
            xs = [r["iter"] for r in iters if k in r]
            ys = [r[k] for r in iters if k in r]
            ax.plot(xs, ys, label=k)
        ax.set_xlabel("iter")
        ax.legend()
        fig.savefig(args.plot, dpi=120)
        print("wrote", args.plot)


if __name__ == "__main__":
    main()
