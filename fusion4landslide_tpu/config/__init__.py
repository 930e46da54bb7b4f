"""YAML config loading (reference: utils/common.py:20-39 ``load_yaml``).

The reference loads one YAML per (method, dataset) pair and optionally
flattens section dicts into a single attribute namespace; pipeline objects
then read flat keys. We keep the same on-disk schema so reference configs
port over, but expose an immutable-ish attribute dict instead of stuffing
loggers/models into the config (an anti-pattern noted in SURVEY.md §5).
"""

from __future__ import annotations

from typing import Any

import yaml

__all__ = ["Config", "load_yaml"]


class Config(dict):
    """dict with attribute access, recursively wrapping nested dicts."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @staticmethod
    def wrap(obj: Any) -> Any:
        if isinstance(obj, dict):
            return Config({k: Config.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [Config.wrap(v) for v in obj]
        return obj


def load_yaml(path: str, keep_sub_directory: bool = False) -> Config:
    """Load a YAML config.

    With ``keep_sub_directory=False`` (the default, matching the reference's
    f2s3/piecewise drivers, main_f2s3.py:130) all top-level sections are
    flattened into one namespace; with ``True`` (fusion driver) the section
    structure is preserved *and* the flattened keys are also available.
    """
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    flat: dict[str, Any] = {}
    for key, value in raw.items():
        if isinstance(value, dict):
            flat.update(value)
            if keep_sub_directory:
                flat[key] = value
        else:
            flat[key] = value
    return Config.wrap(flat)
