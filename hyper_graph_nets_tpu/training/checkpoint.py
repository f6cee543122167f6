"""Checkpointing: full training state with epoch-granular resume.

Parity with the reference's pickle-the-whole-simulator scheme
(reference src/algorithms/MeshSimulator.py:483-493, resume scan
src/tasks/MeshTask.py:71-87): one checkpoint carries network params, Adam
state, normalizer statistics, and the epoch counter.  The filename encodes
the experiment like the reference
(``model_{...}_epoch:{e}.pkl``); ``latest()`` resumes from the newest epoch.

State is stored as a pickled pytree of numpy arrays (flax.struct dataclasses
pickle cleanly), so checkpoints are portable across devices and host counts.
"""
from __future__ import annotations

import os
import pickle
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np


def checkpoint_name(config: dict, epoch: int) -> str:
    """Hyperparameter-encoding filename (reference MeshTask.py:64-69)."""
    params = config.get("params", config)
    model = params["model"]
    rmp = model.get("rmp", {})
    bal = model.get("graph_balancer", {})
    return (
        f"model_{rmp.get('num_clusters', 0)}_cluster:{rmp.get('clustering', 'none')}"
        f"_connector:{rmp.get('connector', 'none')}"
        f"_balancer:{bal.get('algorithm', 'none')}"
        f"_mp:{model.get('message_passing_steps', 0)}_epoch:{epoch}.pkl"
    )


def _backend(config: dict) -> str:
    params = config.get("params", config)
    return params.get("logging", {}).get("checkpoint_backend", "pickle")


def save(directory: str, config: dict, tstate: Any, epoch: int, extra: Optional[dict] = None) -> str:
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, checkpoint_name(config, epoch))
    if _backend(config) == "orbax":
        return _orbax_save(path, tstate, epoch, extra)
    payload = {
        "tstate": jax.tree.map(lambda x: np.asarray(x), tstate),
        "epoch": epoch,
        "extra": extra or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)
    return path


def load(path: str, template: Any = None) -> Tuple[Any, int, dict]:
    if os.path.isdir(path):  # orbax checkpoints are directories
        return _orbax_load(path, template)
    with open(path, "rb") as f:
        payload = pickle.load(f)
    tstate = jax.tree.map(lambda x: jax.numpy.asarray(x), payload["tstate"])
    return tstate, payload["epoch"], payload.get("extra", {})


# -- orbax backend (production checkpointing: async-capable, multi-host,
#    per-array storage; config: logging.checkpoint_backend: orbax) ---------


def _orbax_save(path: str, tstate: Any, epoch: int, extra: Optional[dict]) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            path,
            {
                "tstate": jax.tree.map(np.asarray, tstate),
                "meta": {"epoch": np.asarray(epoch, np.int64)},
            },
            force=True,
        )
    if extra:
        import json

        with open(os.path.join(path, "extra.json"), "w") as f:
            json.dump(extra, f, default=str)
    return path


def _orbax_load(path: str, template: Any = None) -> Tuple[Any, int, dict]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        target = None
        if template is not None:
            target = {
                "tstate": jax.tree.map(np.asarray, template),
                "meta": {"epoch": np.asarray(0, np.int64)},
            }
        payload = ckptr.restore(path, target)
    tstate = jax.tree.map(jax.numpy.asarray, payload["tstate"])
    epoch = int(np.asarray(payload["meta"]["epoch"]))
    extra = {}
    extra_path = os.path.join(path, "extra.json")
    if os.path.exists(extra_path):
        import json

        with open(extra_path) as f:
            extra = json.load(f)
    return tstate, epoch, extra


def latest(directory: str, config: dict) -> Optional[Tuple[str, int]]:
    """Newest matching checkpoint (reference resume scan, MeshTask.py:71-87)."""
    if not os.path.isdir(directory):
        return None
    stem = checkpoint_name(config, 0)
    prefix = stem.split("_epoch:")[0]
    best: Optional[Tuple[str, int]] = None
    for name in os.listdir(directory):
        m = re.match(re.escape(prefix) + r"_epoch:(\d+)\.pkl$", name)
        if m:
            epoch = int(m.group(1))
            if best is None or epoch > best[1]:
                best = (os.path.join(directory, name), epoch)
    return best
