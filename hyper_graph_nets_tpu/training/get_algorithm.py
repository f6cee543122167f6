"""Algorithm factory + abstract base (reference C2/C3 parity).

Reference src/algorithms/get_algorithm.py:10-16 maps ``task.task == 'mesh'``
to MeshSimulator; AbstractIterativeAlgorithm.py:9-161 defines the driver
interface.
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, Optional

from hyper_graph_nets_tpu.training.simulator import MeshSimulator
from hyper_graph_nets_tpu.utils.config import get_from_nested_dict


class AbstractIterativeAlgorithm:
    """Interface of a training/eval driver (reference C2)."""

    def initialize(self, logger=None):
        raise NotImplementedError

    def fit_trajectory(self, tstate, trajectory, epoch: int = 0):
        raise NotImplementedError

    def one_step_evaluator(self, tstate, trajectories, **kw) -> Dict[str, float]:
        raise NotImplementedError

    def rollout_evaluator(self, tstate, trajectories, **kw) -> Dict[str, Any]:
        raise NotImplementedError

    def n_step_evaluator(self, tstate, trajectories, **kw) -> Dict[str, float]:
        raise NotImplementedError


# MeshSimulator implements the interface structurally (duck-typed pytrees
# rather than an inheritance requirement).


def get_algorithm(config: dict, out_dir: Optional[str] = None) -> MeshSimulator:
    """'mesh' -> MeshSimulator (reference get_algorithm.py:10-16)."""
    params = config.get("params", config)
    name = get_from_nested_dict(params, ["task", "task"], default_return="mesh")
    if name == "mesh":
        return MeshSimulator(config, out_dir=out_dir)
    raise NotImplementedError(f"unknown algorithm task {name!r}")
