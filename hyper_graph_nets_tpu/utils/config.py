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


def initialize_config(config: dict, repetition: int = 0) -> dict:
    """cw2-style experiment-config processing (reference util/InitializeConfig.py:5-76).

    Dead code in the reference's live path, re-implemented for surface
    completeness: builds the recording structure from the experiment header,
    resolves per-repetition random seeds ('default' -> repetition index,
    'tied' -> copy numpy's), and normalizes keys — ``log_``-prefixed values
    expand to ``2**v`` (tiny negatives round to 0), integer-valued floats
    become ints.  Returns the processed ``params`` dict.
    """
    import copy

    recording = {
        "_groupname": config.get("_experiment_name"),
        "_runname": f"{config.get('_experiment_name')}_{repetition}",
        "_recording_dir": config.get("params", {}).get("_rep_log_path")
        or config.get("_rep_log_path"),
        "_job_name": config.get("name"),
    }
    iterations = config.get("iterations")
    out = copy.deepcopy(config.get("params", {}))
    if "_recording_structure" in out:
        raise ValueError("may not use pre-defined '_recording_structure' subconfig")
    if "iterations" in out:
        raise ValueError("'iterations' must be defined outside of 'params'")
    out["_recording_structure"] = recording
    out["iterations"] = iterations

    seeds = dict(out.get("random_seeds") or {})
    if seeds.get("numpy") == "default":
        seeds["numpy"] = repetition
    if seeds.get("pytorch") == "default":
        seeds["pytorch"] = repetition
    elif seeds.get("pytorch") == "tied":
        seeds["pytorch"] = seeds.get("numpy")
    out["random_seeds"] = seeds

    def process(node):
        parsed = {}
        for key, value in node.items():
            if isinstance(value, dict):
                parsed[key] = process(value)
            elif key.startswith("log_"):
                if isinstance(value, int) and value > 0:
                    parsed[key.replace("log_", "", 1)] = int(2**value)
                elif isinstance(value, int) and value < -30:
                    parsed[key.replace("log_", "", 1)] = 0
                else:
                    parsed[key.replace("log_", "", 1)] = 2**value
            elif isinstance(value, float) and value.is_integer():
                parsed[key] = int(value)
            else:
                parsed[key] = value
        return parsed

    return process(out)
