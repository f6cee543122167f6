"""Cross-trajectory bucketing: pad variable-size meshes to static shapes.

Real cylinder_flow / deforming_plate trajectories have different meshes and
node counts (SURVEY.md §7 hard parts).  Under XLA every distinct shape is a
new compile, so trajectories are padded to a shared capacity:

- node arrays pad with zeros and ``node_type = PAD_NODE_TYPE`` (-1), which
  is excluded from every loss mask (never NORMAL/OUTFLOW), from node-type
  one-hots (one_hot of -1 is all-zero), from world-edge candidacy, and from
  normalizer statistics (models mask on ``node_type >= 0``);
- topology is built from the *unpadded* cells with ``num_nodes = capacity``,
  so no edges touch padded nodes; the edge dimension pads separately via
  Topology.mask;
- cells stay unpadded (they never reach the device — topology is extracted
  on host, visualization reads them from host memory).
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Tuple

import numpy as np

PAD_NODE_TYPE = -1

_NODE_KEYS_EXCLUDED = ("cells",)


def trajectory_capacity(trajectories: Iterable[Dict[str, np.ndarray]]) -> Tuple[int, int]:
    """(max nodes, max directed mesh edges) over an iterable of trajectories."""
    from hyper_graph_nets_tpu.core.mesh import cells_to_edges

    max_nodes = 0
    max_edges = 0
    for traj in trajectories:
        max_nodes = max(max_nodes, traj["node_type"].shape[1])
        cells = np.asarray(traj["cells"][0])
        deform = cells.shape[-1] == 4
        edges = cells_to_edges(cells, deform=deform)
        max_edges = max(max_edges, len(edges.senders))
    return max_nodes, max_edges


def pad_trajectory(
    trajectory: Dict[str, np.ndarray], num_nodes: int
) -> Dict[str, np.ndarray]:
    """Pad all per-node arrays to ``num_nodes`` (node_type -> PAD_NODE_TYPE)."""
    n = trajectory["node_type"].shape[1]
    if n > num_nodes:
        raise ValueError(f"trajectory has {n} nodes > capacity {num_nodes}")
    if n == num_nodes:
        return trajectory
    pad = num_nodes - n
    out = {}
    for key, val in trajectory.items():
        if key in _NODE_KEYS_EXCLUDED:
            out[key] = val
            continue
        pad_block = np.zeros((val.shape[0], pad) + val.shape[2:], val.dtype)
        if "node_type" in key:
            pad_block[:] = PAD_NODE_TYPE
        out[key] = np.concatenate([val, pad_block], axis=1)
    return out


def pad_topology(model, trajectory: Dict[str, np.ndarray], num_nodes: int,
                 num_edges: int):
    """Build a Topology at the padded capacity with a padded edge dimension."""
    from hyper_graph_nets_tpu.core.mesh import receivers_to_gather

    topo = model.build_topology(trajectory["cells"][0], num_nodes=num_nodes)
    e = len(topo.senders)
    if e > num_edges:
        raise ValueError(f"trajectory has {e} edges > capacity {num_edges}")
    if e == num_edges:
        # attach an explicit all-ones mask: every bucketed topology then has
        # the same static structure (field None-ness), so exact-capacity
        # meshes share the one compiled topology-as-argument train step
        if topo.mask is None:
            topo = topo._replace(mask=np.ones(e, np.float32))
        return topo
    pad = num_edges - e
    senders = np.concatenate([topo.senders, np.zeros(pad, np.int32)])
    # pad receivers at the top index to keep receiver-sortedness
    receivers = np.concatenate(
        [topo.receivers, np.full(pad, num_nodes - 1, np.int32)]
    )
    mask = np.concatenate([np.ones(e, np.float32), np.zeros(pad, np.float32)])
    gidx, gvalid = receivers_to_gather(receivers, num_nodes, mask=mask)
    # the band plan encodes the edge dimension; rebuild at padded capacity
    band_plan = None
    if topo.band_plan is not None:
        from hyper_graph_nets_tpu.models.base import try_band_plan

        band_plan = try_band_plan(
            senders, receivers, num_nodes, num_valid=e,
            chunk=model.params["model"].get("fused_chunk"),
        )
    return topo._replace(
        senders=senders, receivers=receivers, mask=mask,
        gather_idx=gidx, gather_valid=gvalid, band_plan=band_plan,
    )


class BucketedDataset:
    """Wrap a trajectory iterable, padding everything to shared capacity."""

    def __init__(self, trajectories: List[Dict[str, np.ndarray]], model):
        self._model = model
        self.num_nodes, self.num_edges = trajectory_capacity(trajectories)
        self._trajectories = trajectories

    def __iter__(self):
        for traj in self._trajectories:
            yield pad_trajectory(traj, self.num_nodes)

    def topology(self, trajectory: Dict[str, np.ndarray]):
        return pad_topology(self._model, trajectory, self.num_nodes, self.num_edges)
