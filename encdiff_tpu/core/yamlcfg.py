"""Minimal OmegaConf-compatible config containers.

The reference depends on OmegaConf for (a) YAML loading, (b) left-to-right
config merging, (c) CLI dotlist overrides, and (d) attribute-style access
(``main_val.py:585-587``). OmegaConf is not available in this image, so this
module provides a small, dependency-free implementation of exactly that
surface. If the real ``omegaconf`` is importable it is used instead (see
``OmegaConf`` export at the bottom).
"""

from __future__ import annotations

import copy
import io
from typing import Any, Iterable

import yaml


class ConfigNode(dict):
    """dict with attribute access and recursive wrapping."""

    def __init__(self, data: dict | None = None):
        super().__init__()
        if data:
            for k, v in data.items():
                self[k] = v

    def __setitem__(self, key, value):
        super().__setitem__(key, _wrap(value))

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __deepcopy__(self, memo):
        return ConfigNode({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def get(self, key, default=None):
        return super().get(key, default)

    def pop(self, key, *default):
        return super().pop(key, *default)


def _wrap(value: Any) -> Any:
    if isinstance(value, ConfigNode):
        return value
    if isinstance(value, dict):
        return ConfigNode(value)
    if isinstance(value, (list, tuple)):
        return [_wrap(v) for v in value]
    return value


def _merge_into(dst: ConfigNode, src: dict) -> None:
    for k, v in src.items():
        if k in dst and isinstance(dst[k], ConfigNode) and isinstance(v, dict):
            _merge_into(dst[k], v)
        else:
            dst[k] = v


def _parse_value(text: str) -> Any:
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


class _OmegaConfShim:
    """Static-method namespace mirroring the OmegaConf calls we use."""

    @staticmethod
    def load(path_or_file) -> ConfigNode:
        if hasattr(path_or_file, "read"):
            data = yaml.safe_load(path_or_file.read())
        else:
            with open(path_or_file) as f:
                data = yaml.safe_load(f)
        return ConfigNode(data or {})

    @staticmethod
    def create(data: Any = None) -> ConfigNode:
        if data is None:
            return ConfigNode()
        if isinstance(data, str):
            return ConfigNode(yaml.safe_load(data) or {})
        return ConfigNode(dict(data))

    @staticmethod
    def merge(*configs: Any) -> ConfigNode:
        out = ConfigNode()
        for cfg in configs:
            if cfg is None:
                continue
            _merge_into(out, cfg)
        return out

    @staticmethod
    def from_dotlist(dotlist: Iterable[str]) -> ConfigNode:
        out = ConfigNode()
        for item in dotlist:
            if "=" not in item:
                raise ValueError(f"dotlist entry must be key=value, got {item!r}")
            key, value = item.split("=", 1)
            node = out
            parts = key.split(".")
            for part in parts[:-1]:
                if part not in node or not isinstance(node[part], ConfigNode):
                    node[part] = ConfigNode()
                node = node[part]
            node[parts[-1]] = _parse_value(value)
        return out

    @staticmethod
    def to_container(cfg: Any, resolve: bool = True) -> Any:
        del resolve
        return to_container(cfg)

    @staticmethod
    def to_yaml(cfg: Any) -> str:
        return yaml.safe_dump(to_container(cfg), sort_keys=False)

    @staticmethod
    def save(cfg: Any, path) -> None:
        text = _OmegaConfShim.to_yaml(cfg)
        if hasattr(path, "write"):
            path.write(text)
        else:
            with open(path, "w") as f:
                f.write(text)

    @staticmethod
    def is_config(cfg: Any) -> bool:
        return isinstance(cfg, ConfigNode)


def to_container(cfg: Any) -> Any:
    if isinstance(cfg, dict):
        return {k: to_container(v) for k, v in cfg.items()}
    if isinstance(cfg, (list, tuple)):
        return [to_container(v) for v in cfg]
    return cfg


try:  # pragma: no cover - prefer the real library when present
    from omegaconf import OmegaConf  # type: ignore
except ImportError:
    OmegaConf = _OmegaConfShim  # type: ignore

__all__ = ["OmegaConf", "ConfigNode", "to_container"]
