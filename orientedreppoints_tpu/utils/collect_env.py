"""Environment report logged at every train/test start.

TPU-native equivalent of the reference's collect_env
(mmdet/utils/collect_env.py: sys/python/CUDA/GCC/torch/opencv/mmdet
versions) — reports the JAX/XLA stack and TPU topology instead of the
CUDA stack, plus the native-extension compiler.
"""

from __future__ import annotations

import os
import subprocess
import sys


def collect_env() -> dict:
    env = {}
    env["sys.platform"] = sys.platform
    env["Python"] = sys.version.replace("\n", "")

    try:
        import jax

        env["JAX"] = jax.__version__
        try:
            import jaxlib

            env["jaxlib"] = jaxlib.__version__
        except Exception:
            pass
        env["JAX backend"] = jax.default_backend()
        devices = jax.devices()
        env["Devices"] = ", ".join(
            f"{d.platform}:{d.id} ({d.device_kind})" for d in devices
        )
        env["Device count"] = len(devices)
    except Exception as e:  # pragma: no cover - jax import failure
        env["JAX"] = f"unavailable ({e})"

    for mod in ("flax", "optax", "orbax.checkpoint", "numpy", "cv2"):
        try:
            m = __import__(mod)
            for part in mod.split(".")[1:]:
                m = getattr(m, part)
            env[mod] = getattr(m, "__version__", "unknown")
        except Exception:
            env[mod] = "not installed"

    try:
        gcc = subprocess.check_output(
            "gcc --version | head -n1", shell=True, timeout=10
        )
        env["GCC"] = gcc.decode().strip()
    except Exception:
        env["GCC"] = "n/a"

    env["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "")
    env["JAX_PLATFORMS"] = os.environ.get("JAX_PLATFORMS", "")

    from .. import __version__ as orp_version

    env["OrientedRepPoints-TPU"] = orp_version
    # native polyiou extension availability (csrc/polyiou.cpp)
    try:
        from ..devkit.polygon import _load_native

        env["Native polyiou"] = bool(_load_native())
    except Exception:
        env["Native polyiou"] = "unknown"
    return env


def env_info_str() -> str:
    return "\n".join(f"{k}: {v}" for k, v in collect_env().items())
