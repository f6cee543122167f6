"""Explicit shard_map halo-exchange forward (edge-partitioned graphs).

The GSPMD path (parallel/sharding.py) lets XLA place the collectives; this
module is the hand-rolled equivalent for when explicit control over the
communication schedule is wanted: edges are partitioned across the 'graph'
mesh axis, node latents are replicated, and every aggregation combines
device-local partial sums with psum/pmax/pmin over ICI
(core.segment_ops.collective_aggregate).  This is the owner-computes
halo-exchange pattern of SURVEY.md §7.8.  With ``ring=True`` the partials
ride the Pallas ``make_async_remote_copy`` RDMA ring
(ops/pallas/ring.py) instead of XLA collectives — one ring pass carries
all pna partials with per-segment combines.

Forward-only by design: for training, prefer the GSPMD step where XLA
derives the exact transposed collectives for the backward pass.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from hyper_graph_nets_tpu.core.graph import EdgeSet, Graph
from hyper_graph_nets_tpu.models.base import ModelState, SystemModel, Topology
from hyper_graph_nets_tpu.nn.meshgraphnet import network_apply


def graph_partition_specs(graph: Graph) -> Graph:
    """PartitionSpec pytree: edge arrays over 'graph', node tiers replicated."""
    from hyper_graph_nets_tpu.ops.pallas.fused_block import band_plan_specs

    edge_specs = {}
    for name, es in graph.edge_sets.items():
        edge_specs[name] = EdgeSet(
            features=P("graph"),
            senders=P("graph"),
            receivers=P("graph"),
            mask=None if es.mask is None else P("graph"),
            gather_idx=None,
            gather_valid=None,
            # stacked sharded band plan: leading axis over 'graph', so
            # each device sees its local plan (fused halo forward)
            band_plan=(None if es.band_plan is None
                       else band_plan_specs(P, es.band_plan)),
        )
    return Graph(
        node_features=P(),
        edge_sets=edge_specs,
        hyper_features=None if graph.hyper_features is None else P(),
        node_mask=None if graph.node_mask is None else P(),
        hyper_mask=None if graph.hyper_mask is None else P(),
    )


def strip_gather(graph: Graph) -> Graph:
    """Remove gather matrices (they index global edge ids; invalid per-shard)."""
    return graph.replace(
        edge_sets={
            name: es.replace(gather_idx=None, gather_valid=None)
            for name, es in graph.edge_sets.items()
        }
    )


def make_halo_forward(
    model: SystemModel, mesh: Mesh, ring: bool = False, overlap: bool = False
):
    """Build a shard_map forward: fn(params, graph) -> [N, out].

    ``graph`` must have edge counts divisible by the 'graph' axis size (pad
    with parallel/sharding.shard_topology conventions).  ``ring=True``
    combines aggregation partials with the Pallas RDMA ring
    (ops/pallas/ring.py) instead of XLA psum/pmax/pmin — the explicit
    compute/communication schedule; on non-TPU backends the ring runs in
    Pallas interpret mode.  ``overlap=True`` goes one step further for
    fused band-plan edge sets whose stacked plan carries ``ov_sched``
    (shard_topology(..., overlap_bands=...)): compute and the banded
    double-buffered ring run in ONE kernel, so a band's partials are in
    flight while later chunks compute (ops/pallas/fused_overlap.py).
    """
    cfg = dataclasses.replace(
        model.gnn_config,
        axis_name="graph",
        halo_ring=ring,
        halo_overlap=overlap,
        halo_mesh_axes=tuple((a, mesh.shape[a]) for a in mesh.axis_names),
    )

    def local_forward(params, graph):
        return network_apply(params, graph, cfg)

    def fwd(params, graph: Graph):
        graph = strip_gather(graph)
        shard = jax.shard_map(
            local_forward,
            mesh=mesh,
            in_specs=(P(), graph_partition_specs(graph)),
            out_specs=P(),
            check_vma=False,
        )
        return shard(params, graph)

    return jax.jit(fwd)
