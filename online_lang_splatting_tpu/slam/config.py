"""YAML configuration with recursive `inherit_from` merging.

Same schema and semantics as the reference loader
(/root/reference/utils/config_utils.py:4-50): a config may name a base
file via `inherit_from`; children override parents key-by-key (deep
merge). The merged dict keeps the reference YAML layout so the
reference's configs work unchanged.
"""

from __future__ import annotations

from pathlib import Path

import yaml


def _deep_update(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_update(out[k], v)
        else:
            out[k] = v
    return out


def load_config(path: str | Path) -> dict:
    path = Path(path)
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    parent = cfg.pop("inherit_from", None)
    if parent:
        parent_path = Path(parent)
        if not parent_path.is_absolute():
            # The reference uses paths relative to the CWD; support both.
            cand = path.parent / parent_path.name
            parent_path = parent_path if parent_path.exists() else cand
        base = load_config(parent_path)
        cfg = _deep_update(base, cfg)
    return cfg
