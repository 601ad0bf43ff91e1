"""Minimal hydra-style config composition (no external deps).

The reference uses Hydra + OmegaConf structured configs (SURVEY §5 'config/flag
system': groups `mppi` / `isaacgym` / `actors` composed per task via
`defaults:` + CLI overrides). Hydra is pure Python but not available in this
image, so this module implements the same composition model:

* a config *root* directory with group subdirectories (`conf/mppi/*.yaml`, ...)
* per-task YAMLs with a ``defaults:`` list (``- group: name`` entries, and
  ``_self_`` ordering semantics)
* dotted CLI overrides: ``mppi.num_samples=500`` (parsed with YAML scalars)

`compose(root, task_yaml, overrides)` returns a plain nested dict; dataclass
schemas are applied by the caller (utils.config_store).
"""
from __future__ import annotations

import copy
import os
from typing import Any, Dict, List, Optional

import yaml


def _deep_merge(base: Dict, over: Dict) -> Dict:
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _load_yaml(path: str) -> Dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def _resolve_group(root: str, group: str, name: str) -> Dict:
    path = os.path.join(root, group, f"{name}.yaml")
    cfg = _load_yaml(path)
    defaults = cfg.pop("defaults", [])
    merged: Dict = {}
    for entry in defaults:
        if entry == "_self_":
            merged = _deep_merge(merged, cfg)
            cfg = {}
            continue
        if isinstance(entry, str):
            merged = _deep_merge(merged, _resolve_group(root, group, entry))
        elif isinstance(entry, dict):
            for g, n in entry.items():
                merged = _deep_merge(merged, _resolve_group(root, g, n))
    return _deep_merge(merged, cfg)


def set_dotted(cfg: Dict, key: str, value: Any) -> None:
    parts = key.split(".")
    d = cfg
    for p in parts[:-1]:
        d = d.setdefault(p, {})
    d[parts[-1]] = value


def compose(
    root: str,
    task: str,
    overrides: Optional[List[str]] = None,
) -> Dict:
    """task: path to a task yaml (absolute or relative to `root`)."""
    path = task if os.path.isabs(task) else os.path.join(root, task)
    if not path.endswith(".yaml"):
        path += ".yaml"
    cfg = _load_yaml(path)
    defaults = cfg.pop("defaults", [])
    merged: Dict = {}
    self_seen = False
    for entry in defaults:
        if entry == "_self_":
            merged = _deep_merge(merged, cfg)
            self_seen = True
            continue
        if isinstance(entry, str):
            sub = _resolve_group(root, os.path.dirname(task), entry)
            merged = _deep_merge(merged, sub)
        elif isinstance(entry, dict):
            for g, n in entry.items():
                merged.setdefault(g, {})
                merged[g] = _deep_merge(merged[g], _resolve_group(root, g, n))
    if not self_seen:
        merged = _deep_merge(merged, cfg)
    for ov in overrides or []:
        k, _, v = ov.partition("=")
        set_dotted(merged, k, yaml.safe_load(v))
    return merged


def parse_cli(argv: List[str]) -> List[str]:
    """Filter `key=value` override tokens from argv (hydra CLI parity)."""
    return [a for a in argv if "=" in a and not a.startswith("-")]
