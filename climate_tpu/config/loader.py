"""Hydra-compatible YAML config composition + dotted CLI overrides.

Preserves the reference's exact config surface (BASELINE.json requirement)
without the Hydra dependency:
- configs/main_config.yaml holds a `defaults` list naming group files
  (data/model/training/trainer), composed in order, `_self_` last
  (reference: configs/main_config.yaml:3-8);
- group files carry `# @package _global_.<group>` headers placing their keys
  under the group (reference: configs/data/default.yaml:1);
- CLI overrides use dotted `key=value` syntax including group swaps
  (`data=data_final`, `model=SimpleCNN`, `training.lr=1e-3`) like
  `python main.py key=value` (reference: commands.md:2-4).
"""

from __future__ import annotations

import copy
import os
import re
from typing import Any

import yaml

GROUPS = ("data", "model", "training", "trainer")


def _package_target(path: str, text: str) -> list[str]:
    """Parse the `# @package` header into a key path ([] = root)."""
    m = re.search(r"^#\s*@package\s+(\S+)", text, re.MULTILINE)
    if not m:
        # default: place under the group dir name, as hydra would
        group = os.path.basename(os.path.dirname(path))
        return [group] if group else []
    pkg = m.group(1)
    if pkg == "_global_":
        return []
    if pkg.startswith("_global_."):
        return pkg[len("_global_."):].split(".")
    return pkg.split(".")


# Only the scalar shapes PyYAML 1.1 *mis*-parses as strings: an exponent with
# no decimal point ('5e-4', '1E6'). Plain ints/floats are already parsed by
# yaml.safe_load, so any other numeric-looking string (e.g. a quoted
# run_name: "2024") was quoted deliberately and must stay a string.
_YAML11_EXP_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+$")


def _fix_numbers(node: Any) -> Any:
    """PyYAML (YAML 1.1) leaves '5e-4' as a string; OmegaConf — whose config
    surface we mirror — parses it as a float. Coerce exactly that case."""
    if isinstance(node, dict):
        return {k: _fix_numbers(v) for k, v in node.items()}
    if isinstance(node, list):
        return [_fix_numbers(v) for v in node]
    if isinstance(node, str) and _YAML11_EXP_RE.match(node):
        return float(node)
    return node


def _load_yaml(path: str) -> tuple[dict, list[str]]:
    with open(path) as f:
        text = f.read()
    data = _fix_numbers(yaml.safe_load(text) or {})
    return data, _package_target(path, text)


def _set_path(tree: dict, keys: list[str], value: Any) -> None:
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    if keys:
        node[keys[-1]] = value
    else:
        _merge(tree, value)


def _merge(dst: dict, src: dict) -> None:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _merge(dst[k], v)
        else:
            dst[k] = v


def _coerce(s: str) -> Any:
    """YAML-style scalar coercion for CLI override values."""
    return _fix_numbers(yaml.safe_load(s))


def compose(
    config_dir: str,
    config_name: str = "main_config.yaml",
    overrides: list[str] | None = None,
) -> dict:
    """Compose the config tree (defaults list + group files + CLI overrides)."""
    main_path = os.path.join(config_dir, config_name)
    main_cfg, _ = _load_yaml(main_path)

    defaults = main_cfg.pop("defaults", [])
    group_choice: dict[str, str] = {}
    order: list[str] = []
    for item in defaults:
        if item == "_self_":
            order.append("_self_")
            continue
        if isinstance(item, dict):
            ((group, name),) = item.items()
        else:
            group, _, name = str(item).partition(": ")
        group_choice[group] = name
        order.append(group)
    if "_self_" not in order:
        order.append("_self_")

    # CLI group swaps (e.g. `data=data_final`) change the defaults choice.
    overrides = list(overrides or [])
    remaining: list[str] = []
    for ov in overrides:
        key, _, val = ov.partition("=")
        if key in group_choice and "." not in key:
            group_choice[key] = val
        else:
            remaining.append(ov)

    cfg: dict = {}
    for entry in order:
        if entry == "_self_":
            _merge(cfg, copy.deepcopy(main_cfg))
            continue
        name = group_choice[entry]
        path = os.path.join(config_dir, entry, f"{name}.yaml")
        if not os.path.exists(path):
            path = os.path.join(config_dir, entry, name)  # allow extension in name
        data, target = _load_yaml(path)
        _set_path(cfg, target or [entry], data)

    for ov in remaining:
        if "=" not in ov:
            raise ValueError(f"Override must be key=value: {ov!r}")
        key, _, val = ov.partition("=")
        _set_path(cfg, key.split("."), _coerce(val))

    cfg.setdefault("seed", 42)
    return cfg


def to_yaml(cfg: dict) -> str:
    return yaml.safe_dump(cfg, sort_keys=False)
