"""One-command long training runs on the axon TPU runtime.

The axon runtime leaks host RSS per H2D transfer (~25 MB/step at B8
512x512 f32 — characterized in PROGRESS.md round-3 gotchas; gc/sync/feed
probes all negative).  A 125-epoch run therefore OOM-kills the process
unless it is split across OS processes.  Round 3's mitigation was a
manual recipe (--stop_epoch 32/64/.../--resume re-invocations); this
module makes it automatic: at every epoch boundary the trainer checks its
resident set size and, past a threshold, checkpoints and **re-execs
itself** (os.execv — same pid, fresh address space) with the resume flag
appended.  A 40-epoch flagship run is one command again, matching the
reference runner's unattended epoch loop
(/root/reference/mmdet/apis/train.py:179-183, which relies on
epoch-checkpoint + --resume_from for crash recovery).

Bounded by construction: re-exec only happens when at least one epoch was
completed in this process AND more remain, so the number of execs is at
most total_epochs even if the threshold is below the baseline RSS.
"""

from __future__ import annotations

import os
import sys
from typing import Callable, Iterable

__all__ = ["current_rss_gb", "argv_with_flags", "maybe_reexec"]


def current_rss_gb() -> float:
    """Current (not peak) resident set size in GB, from /proc/self/status.

    ru_maxrss is a high-water mark and never falls; the leak we guard
    against is monotone anyway, but current RSS is the honest signal.
    """
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1e6  # kB -> GB
    except OSError:
        pass
    import resource

    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def argv_with_flags(
    argv: list[str],
    ensure: Iterable[str] = (),
    ensure_kv: dict[str, str] | None = None,
) -> list[str]:
    """argv for the resumed process: append each bare flag in `ensure`
    if absent; set/replace each `--flag value` pair in `ensure_kv`."""
    out = list(argv)
    for flag in ensure:
        if flag not in out:
            out.append(flag)
    for flag, value in (ensure_kv or {}).items():
        if flag in out:
            i = out.index(flag)
            if i + 1 < len(out):
                out[i + 1] = value
            else:
                out.append(value)
        else:
            out += [flag, value]
    return out


def maybe_reexec(
    rss_limit_gb: float,
    save_fn: Callable[[], None],
    build_argv: Callable[[list[str]], list[str]],
    log: Callable[[str], None] = print,
) -> None:
    """At an epoch boundary: if RSS >= rss_limit_gb, checkpoint via
    save_fn() and replace this process with a resumed invocation.

    Never returns if the threshold is crossed (os.execv).  Callers invoke
    this only when more epochs remain, so the final chunk's evaluation
    runs in-process.  rss_limit_gb <= 0 disables the check.
    """
    if not rss_limit_gb or rss_limit_gb <= 0:
        return
    rss = current_rss_gb()
    if rss < rss_limit_gb:
        return
    save_fn()
    argv = build_argv(list(sys.argv))
    log(
        f"[chunked] host RSS {rss:.1f}G >= {rss_limit_gb:g}G; "
        f"checkpointed, re-exec: {' '.join(argv)}"
    )
    sys.stdout.flush()
    sys.stderr.flush()
    os.execv(sys.executable, [sys.executable] + argv)
