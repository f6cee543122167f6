"""Trajectory preprocessing: meta decoding, target/history windows, noise.

Parity with reference src/data/preprocessing.py:10-114, re-designed for
array-at-a-time processing: instead of splitting trajectories into python
lists of per-step dicts (reference ``_split_and_preprocess``), windows stay
as ``[T-2, N, D]`` arrays that feed vmapped/jitted train steps directly.
Training noise is applied on-device with JAX PRNG (see training.trainer),
keyed deterministically per (epoch, trajectory) — the reference reseeds
numpy per epoch for the same determinism (src/data/graphloader.py:14).
"""
from __future__ import annotations

import json
import os
from typing import Dict, Iterator, List, Optional

import numpy as np

from hyper_graph_nets_tpu.data import tfrecord


def load_meta(dataset_dir: str) -> dict:
    with open(os.path.join(dataset_dir, "meta.json"), "r") as fp:
        return json.loads(fp.read())


def add_targets(
    trajectory: Dict[str, np.ndarray], fields: str | List[str], history: bool
) -> Dict[str, np.ndarray]:
    """Slide the target window: ``x[1:-1]``, ``prev|x = x[:-2]``, ``target|x = x[2:]``.

    Parity with reference src/data/preprocessing.py:100-114.
    """
    if isinstance(fields, str):
        fields = [fields]
    out = {}
    for key, val in trajectory.items():
        out[key] = val[1:-1]
        if key in fields:
            if history:
                out["prev|" + key] = val[0:-2]
            out["target|" + key] = val[2:]
    return out


def trajectory_windows(
    trajectory: Dict[str, np.ndarray],
    field: str,
    history: bool,
    num_steps: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """add_targets + optional truncation to the first ``num_steps`` frames."""
    out = add_targets(trajectory, field, history)
    if num_steps is not None:
        out = {k: v[:num_steps] for k, v in out.items()}
    return out


class Preprocessing:
    """Stream trajectories from TFRecord (or in-memory) sources.

    Mirrors the reference Preprocessing transform pipeline; the
    per-step splitting + noise stage moved into the jitted train step.
    """

    def __init__(
        self,
        model_config: dict,
        split: str = "train",
        in_dir: Optional[str] = None,
        add_targets_b: bool = True,
    ):
        self._field = model_config["field"]
        self._history = bool(model_config.get("history", False))
        self._in_dir = in_dir
        self._split = split
        self._add_targets_b = add_targets_b

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        meta = load_meta(self._in_dir)
        path = os.path.join(self._in_dir, f"{self._split}.tfrecord")
        for traj in tfrecord.read_trajectories(path, meta):
            if self._add_targets_b:
                yield add_targets(traj, self._field, self._history)
            else:
                yield traj
