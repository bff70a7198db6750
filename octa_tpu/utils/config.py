"""YAML config loading + dotted CLI overrides.

Schema-compatible with the reference config corpus
(``configs/config_template.yml``; override semantics of
``utils/config_overrides.py:18-62``):

- ``--Section.sub.key value``  sets a nested key (value YAML-parsed)
- ``--Section.sub.key=value``  same
- ``--Section.flag``           boolean flag, interpreted as ``true``

Only dotted keys are treated as overrides so plain argparse flags pass through.
"""
from __future__ import annotations

import os
from typing import Any

import yaml


def load_config(path: str) -> dict[str, Any]:
    path = os.path.abspath(path)
    if not os.path.isfile(path):
        raise FileNotFoundError(f"Your provided config path {path} does not exist!")
    with open(path, "r") as stream:
        return yaml.safe_load(stream)


def parse_cli_overrides(unknown_args: list[str]) -> list[tuple[str, str]]:
    overrides: list[tuple[str, str]] = []
    i = 0
    while i < len(unknown_args):
        token = unknown_args[i]
        if not isinstance(token, str) or not token.startswith("--"):
            i += 1
            continue
        keyval = token[2:]
        if "=" in keyval:
            k, v = keyval.split("=", 1)
            overrides.append((k, v))
            i += 1
            continue
        nxt = unknown_args[i + 1] if i + 1 < len(unknown_args) else None
        if isinstance(nxt, str) and not nxt.startswith("--"):
            overrides.append((keyval, nxt))
            i += 2
        else:
            overrides.append((keyval, "true"))
            i += 1
    return overrides


def set_in_config(cfg: dict[str, Any], dotted_key: str, value_str: str) -> None:
    keys = dotted_key.split(".")
    d = cfg
    for k in keys[:-1]:
        if k not in d or not isinstance(d[k], dict):
            d[k] = {}
        d = d[k]
    try:
        parsed = yaml.safe_load(value_str)
    except Exception:
        parsed = value_str
    d[keys[-1]] = parsed


def apply_cli_overrides(config: dict[str, Any], unknown_args: list[str]) -> None:
    """Apply dotted-key overrides found in ``unknown_args`` in place."""
    for k, v in parse_cli_overrides(unknown_args):
        if "." in k:  # avoid clashing with normal flags
            set_in_config(config, k, v)


def dump_config(config: dict[str, Any], path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(config, f, sort_keys=False)
