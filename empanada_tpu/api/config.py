"""YAML config loading with BASE inheritance (reference
``empanada/config_loaders.py``): a config may name a parent via the ``BASE``
key; parents load recursively and children override parents with a recursive
deep merge."""

from __future__ import annotations

import os

import yaml

__all__ = ["read_yaml", "load_config", "merge_dicts"]


def read_yaml(path: str) -> dict:
    with open(path, mode="r") as handle:
        return yaml.load(handle, Loader=yaml.FullLoader)


def merge_dicts(dict1: dict, dict2: dict) -> dict:
    """Recursive in-place merge; dict2 values win."""
    for k, v in dict2.items():
        if isinstance(v, dict) and k in dict1 and isinstance(dict1[k], dict):
            merge_dicts(dict1[k], v)
        else:
            dict1[k] = v
    return dict1


def load_config(config_file: str, base_kw: str = "BASE") -> dict:
    """Load a config following the chain of ``BASE`` parents to the root,
    then apply children over parents."""
    config = read_yaml(config_file)
    if base_kw not in config:
        return config

    chain = [config]
    seen = {os.path.abspath(config_file)}
    while base_kw in config:
        base_path = os.path.join(
            os.path.abspath(os.path.dirname(config_file)), config[base_kw]
        )
        base_path = os.path.abspath(base_path)
        if base_path in seen:
            raise ValueError(
                f"BASE inheritance cycle: {base_path!r} reached twice "
                f"(chain of {len(chain)} configs)"
            )
        seen.add(base_path)
        config = read_yaml(base_path)
        chain.append(config)
        config_file = base_path

    inherited = chain[-1]
    for child in reversed(chain[:-1]):
        inherited = merge_dicts(inherited, child)
    inherited.pop(base_kw, None)
    return inherited
