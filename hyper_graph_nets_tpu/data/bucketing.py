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

from typing import Dict, Iterable, List, Optional, Tuple

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


def bucket_plan_dims(
    model,
    trajectories: Iterable[Dict[str, np.ndarray]],
    num_nodes: int,
    num_edges: int,
) -> Optional[object]:
    """One pinned set of band-plan static dims for a whole bucket.

    Band-plan shapes (chunk, SB, W, WR, scan steps, node rows) are
    data-dependent, and the bucketed train step is compiled once per
    static signature — per-trajectory auto-picked plans would recompile
    the step (100-200 s each through the remote-compile tunnel) whenever
    two meshes' windows straddle a shape boundary.  This pass computes,
    numpy-only, the maxima over every trajectory at one common
    (chunk, sb), so every bucketed plan stacks into the same signature.

    Returns None when the model doesn't run the fused path, or the
    string ``"off"`` when any trajectory is unbandable (every bucketed
    topology then carries ``band_plan=None`` — again one signature).
    """
    from hyper_graph_nets_tpu.core.mesh import cells_to_edges
    from hyper_graph_nets_tpu.models.base import upgrade_512_ok
    from hyper_graph_nets_tpu.ops.pallas.fused_block import (
        _sb_candidates,
        default_chunk,
        plan_dims,
    )

    params = model.params["model"]
    if params.get("agg_vjp") != "fused":
        return None
    latent = getattr(model, "latent_size", 128)
    pb = int(params.get("fused_pb", 1))
    chunk = params.get("fused_chunk")

    edge_lists = []
    for traj in trajectories:
        cells = np.asarray(traj["cells"][0])
        e = cells_to_edges(cells, deform=cells.shape[-1] == 4)
        edge_lists.append((np.asarray(e.senders), np.asarray(e.receivers)))

    if chunk is None:
        chunk = default_chunk()
        if chunk < 512 and all(
            upgrade_512_ok(s, r, num_nodes, latent_size=latent, pb=pb)
            for s, r in edge_lists
        ):
            chunk = 512

    # common sb: smallest split minimizing the bucket-wide max W
    best_sb, best_w = 1, None
    for cand in _sb_candidates(chunk):
        dims = [plan_dims(s, r, chunk=chunk, sb=cand) for s, r in edge_lists]
        if any(d is None for d in dims):
            return "off"
        w = max(d["W"] for d in dims)
        if best_w is None or w < best_w:
            best_sb, best_w = cand, w
    dims = [plan_dims(s, r, chunk=chunk, sb=best_sb) for s, r in edge_lists]
    if any(d is None or d["W"] > 2048 or d["WR"] > 2048 for d in dims):
        return "off"
    # nr must also cover the bucket's padded node space
    nr = max(max(d["nr"] for d in dims), ((num_nodes - 1) // 16) * 16 + 128)
    return {
        "chunk": chunk,
        "sb": best_sb,
        "force": (
            max(d["W"] for d in dims),
            max(d["WR"] for d in dims),
            max(d["steps"] for d in dims),
            nr,
            best_sb,
        ),
    }


def pad_topology(model, trajectory: Dict[str, np.ndarray], num_nodes: int,
                 num_edges: int, plan_dims: Optional[object] = None,
                 topo_extras: Optional[dict] = None):
    """Build a Topology at the padded capacity with a padded edge dimension.

    ``plan_dims``: None = per-trajectory auto plan (legacy); ``"off"`` =
    no band plan; a :func:`bucket_plan_dims` dict = pinned static dims so
    every trajectory in the bucket compiles to one step signature.

    ``topo_extras`` (model.bucket_topology_extras): bucket-stable dims for
    model-specific aux — the plate's obstacle index capacity and world-edge
    capacity floor — so the bucketed topologies keep the obstacle-restricted
    radius query and data-sized world capacity of the unbucketed path.
    """
    from hyper_graph_nets_tpu.core.mesh import receivers_to_gather

    topo = model.build_topology(trajectory["cells"][0], num_nodes=num_nodes)
    aux, world_cap = model.pad_topology_aux(trajectory, num_nodes, topo_extras)
    topo = topo._replace(aux=aux, world_cap=world_cap)
    e = len(topo.senders)
    if e > num_edges:
        raise ValueError(f"trajectory has {e} edges > capacity {num_edges}")

    def bucket_plan(senders, receivers, num_valid):
        from hyper_graph_nets_tpu.models.base import try_band_plan

        if plan_dims == "off":
            return None
        if isinstance(plan_dims, dict):
            return try_band_plan(
                senders, receivers, num_nodes, num_valid=num_valid,
                chunk=plan_dims["chunk"], sb=plan_dims["sb"],
                force_dims=plan_dims["force"],
            )
        # legacy per-trajectory auto plan
        return try_band_plan(
            senders, receivers, num_nodes, num_valid=num_valid,
            chunk=model.params["model"].get("fused_chunk"),
            latent_size=getattr(model, "latent_size", 128),
            pb=int(model.params["model"].get("fused_pb", 1)),
        )

    if e == num_edges:
        # attach an explicit all-ones mask: every bucketed topology then has
        # the same static structure (field None-ness), so exact-capacity
        # meshes share the one compiled topology-as-argument train step
        if topo.mask is None:
            topo = topo._replace(mask=np.ones(e, np.float32))
        if topo.band_plan is not None or plan_dims == "off":
            topo = topo._replace(
                band_plan=bucket_plan(topo.senders, topo.receivers, e)
            )
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
        band_plan = bucket_plan(senders, receivers, e)
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
