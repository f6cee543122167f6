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


def save(directory: str, config: dict, tstate: Any, epoch: int, extra: Optional[dict] = None) -> str:
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, checkpoint_name(config, epoch))
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


def load(path: str) -> Tuple[Any, int, dict]:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    tstate = jax.tree.map(lambda x: jax.numpy.asarray(x), payload["tstate"])
    return tstate, payload["epoch"], payload.get("extra", {})


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
