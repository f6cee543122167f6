"""YAML experiment configuration.

Parity with reference src/util.py:38-47 (multi-doc YAML, the doc named
``DEFAULT`` is selected) and util/Functions.py:5-30 (nested dict access).
Configs are self-contained per experiment; see ``configs/*.yaml``.
"""
from __future__ import annotations

import os
from typing import Any, Iterable, Optional

import yaml

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "configs")


def read_yaml(config_name: str, config_dir: Optional[str] = None) -> dict:
    """Read ``configs/<name>.yaml`` and return the doc whose name is DEFAULT."""
    path = config_name
    if not os.path.isfile(path):
        path = os.path.join(config_dir or CONFIG_DIR, f"{config_name}.yaml")
    if not os.path.isfile(path):
        available = sorted(
            f[:-5]
            for f in os.listdir(config_dir or CONFIG_DIR)
            if f.endswith(".yaml")
        )
        raise FileNotFoundError(
            f"unknown config {config_name!r}; available: {', '.join(available)}"
        )
    with open(path, "r") as stream:
        for doc in yaml.safe_load_all(stream):
            if doc and doc.get("name") == "DEFAULT":
                return doc
    raise ValueError(f"no DEFAULT document in {path}")


_SENTINEL = object()


def get_from_nested_dict(
    dictionary: dict,
    list_of_keys: Iterable[str],
    raise_error: bool = False,
    default_return: Any = None,
) -> Any:
    """Walk nested dicts by key path (reference util/Functions.py:5-30)."""
    current = dictionary
    for key in list_of_keys:
        if not isinstance(current, dict) or key not in current:
            if raise_error:
                raise KeyError(f"key path {list(list_of_keys)} missing at {key!r}")
            return default_return
        current = current[key]
    return current


def params(config: dict) -> dict:
    """Return the ``params`` sub-dict (the reference passes this around)."""
    return config.get("params", config)
