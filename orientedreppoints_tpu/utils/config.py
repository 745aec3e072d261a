"""Python-file config system (mmcv Config.fromfile surface).

The reference wires everything from python-dict configs
(configs/dota/*.py via mmcv Config, tools/train.py:70).  We keep the same
config surface — the same keys and semantics — so reference configs port
nearly verbatim; values are exposed with attribute access.
"""

from __future__ import annotations

import importlib.util
import os.path as osp
from typing import Any


class ConfigDict(dict):
    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return v

    def __setattr__(self, k, v):
        self[k] = v

    def get(self, k, default=None):
        return super().get(k, default)


def _wrap(value):
    if isinstance(value, dict):
        return ConfigDict({k: _wrap(v) for k, v in value.items()})
    if isinstance(value, (list, tuple)):
        return type(value)(_wrap(v) for v in value)
    return value


class Config:
    @staticmethod
    def fromfile(path: str) -> "Config":
        path = osp.abspath(path)
        spec = importlib.util.spec_from_file_location("_orp_config", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        data = {
            k: v for k, v in vars(mod).items()
            if not k.startswith("__") and not callable(v)
            and not isinstance(v, type(importlib))
        }
        return Config(data, filename=path)

    def __init__(self, data: dict, filename: str | None = None):
        object.__setattr__(self, "_data", _wrap(dict(data)))
        object.__setattr__(self, "filename", filename)

    def __getattr__(self, k):
        try:
            return self._data[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self._data[k] = _wrap(v)

    def __contains__(self, k):
        return k in self._data

    def get(self, k, default=None):
        return self._data.get(k, default)

    def merge_from_dict(self, options: dict):
        """CLI --options key.path=value overrides (tools/test.py:16-44)."""
        for key, val in options.items():
            d = self._data
            parts = key.split(".")
            for p in parts[:-1]:
                d = d.setdefault(p, ConfigDict())
            d[parts[-1]] = _wrap(val)

    @property
    def text(self):
        if self.filename and osp.exists(self.filename):
            with open(self.filename) as f:
                return f.read()
        return repr(self._data)

    def to_dict(self):
        return dict(self._data)
