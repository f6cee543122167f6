"""Core graph types for the TPU-native HyperGraphNets framework.

Reference parity: the PyTorch reference represents graphs with namedtuples
``EdgeSet``/``MultiGraph``/``MultiGraphWithPos`` (reference src/util.py:11-16) and
dynamic shapes throughout.  The TPU-native design instead uses flax.struct
pytrees with *static padded shapes* and explicit validity masks so everything
compiles once under ``jax.jit`` and batches with ``jax.vmap``:

- ``EdgeSet``: features ``[E, F]`` (or ``[B, E, F]``), int32 ``senders``/
  ``receivers`` indexing into the concatenated ``[mesh; hyper]`` node array,
  plus a float ``mask`` for padded edges.
- ``Graph``: mesh node features, optional hyper node features (remote message
  passing tier), and a name-keyed dict of edge sets.  Names are static pytree
  structure, so jit re-traces only when the edge-set *schema* changes.

The mesh/hyper split replaces the reference's "concatenate rows then slice
``[:hyper_node_offset]``" convention (reference src/migration/graphnet.py:36-48)
with two explicit arrays; edge indices remain global (mesh rows first).
"""
from __future__ import annotations

import enum
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


class NodeType(enum.IntEnum):
    """Node type codes used by the DeepMind MeshGraphNets datasets.

    Parity with reference src/util.py:27-35.
    """

    NORMAL = 0
    OBSTACLE = 1
    AIRFOIL = 2
    HANDLE = 3
    INFLOW = 4
    OUTFLOW = 5
    WALL_BOUNDARY = 6
    SIZE = 9


@struct.dataclass
class EdgeSet:
    """One typed edge set with static padded shape.

    ``senders``/``receivers`` are int32 indices into the concatenated node
    array (mesh nodes first, then hyper nodes).  ``mask`` is 1.0 for valid
    edges, 0.0 for padding; padded edges must point at a valid row index (by
    convention row 0) so gathers stay in bounds.
    """

    features: Array  # [..., E, F] float
    senders: Array  # [E] int32
    receivers: Array  # [E] int32
    mask: Optional[Array] = None  # [..., E] float (1 = valid); None = all valid
    # Optional static [num_nodes_total, d_max] neighbor-edge matrix enabling
    # gather-based aggregation (core.mesh.receivers_to_gather) — the fast
    # path for static topology; scatter segment ops are the fallback.
    gather_idx: Optional[Array] = None
    gather_valid: Optional[Array] = None
    # Optional sender-side inverse incidence (receivers_to_gather(senders)):
    # enables a scatter-free backward for the sender gather in the edge
    # update (segment_ops.gather_rows, config model.agg_vjp = 'gather')
    snd_gather_idx: Optional[Array] = None
    snd_gather_valid: Optional[Array] = None
    # Optional static banded-window plan (ops.pallas.fused_block.BandPlan)
    # enabling the fully fused edge-MLP + pna kernel (agg_vjp = 'fused');
    # shared across the batch like senders/receivers (vmap in_axes None)
    band_plan: Optional[object] = None

    @property
    def num_edges(self) -> int:
        return self.senders.shape[-1]


@struct.dataclass
class Graph:
    """A (possibly hierarchical) multigraph with static shapes.

    ``node_features`` are the mesh-tier nodes; ``hyper_features`` (may be a
    zero-row array when unused) are the cluster-tier hyper nodes added by
    remote message passing.  Replaces the reference's ``MultiGraph`` with its
    list-of-node-tiers convention (reference src/util.py:12-13).
    """

    node_features: Array  # [..., N, F]
    edge_sets: Dict[str, EdgeSet]
    hyper_features: Optional[Array] = None  # [..., H, F] or None
    node_mask: Optional[Array] = None  # [..., N] float
    hyper_mask: Optional[Array] = None  # [..., H] float

    @property
    def num_nodes(self) -> int:
        return self.node_features.shape[-2]

    @property
    def num_hyper_nodes(self) -> int:
        if self.hyper_features is None:
            return 0
        return self.hyper_features.shape[-2]


@struct.dataclass
class GraphWithPos:
    """A graph plus geometric context needed by clustering / balancing.

    Parity with the reference's ``MultiGraphWithPos`` (src/util.py:14-16):
    ``target_feature`` is the "world" coordinate stream (world_pos for flag /
    plate, velocity for cylinder), ``mesh_features`` the reference-space mesh
    coordinates.  ``unnormalized_edge_features`` mirror
    ``unnormalized_edges`` and share the mesh edge topology.
    """

    graph: Graph
    target_feature: Array  # [N, D]
    mesh_features: Array  # [N, Dm]
    model_type: str = struct.field(pytree_node=False, default="flag")
    node_dynamic: Optional[Array] = None  # [N]
    unnormalized_edge_features: Optional[Array] = None  # [E, F] mesh edges
    obstacle_mask: Optional[Array] = None  # [N] bool


def concat_node_tiers(graph: Graph) -> Array:
    """Concatenate mesh and hyper node features into one [N+H, F] array."""
    if graph.hyper_features is None or graph.hyper_features.shape[-2] == 0:
        return graph.node_features
    return jnp.concatenate([graph.node_features, graph.hyper_features], axis=-2)


def graph_batch_axes(graph: Graph, include_topology: bool = False):
    """Build a vmap in_axes pytree for ``graph``.

    Feature arrays map over axis 0; topology (senders/receivers) is shared
    across the batch (``None``) unless ``include_topology``.  This is the
    TPU-native replacement for the reference's block-diagonal mini-batching
    (reference src/algorithms/MeshSimulator.py:158-234): frames of one
    trajectory share topology, so vmap over features alone is exactly
    equivalent and much faster.
    """
    edge_axes = {}
    for name, es in graph.edge_sets.items():
        # per-frame (dynamic) topology carries a batch dim on its index
        # arrays (e.g. plate world edges); shared topology does not.
        batched_topo = include_topology or es.senders.ndim >= 2
        topo_axis = 0 if batched_topo else None
        if es.mask is None:
            mask_axis = None
        else:
            mask_axis = 0 if es.mask.ndim >= 2 else topo_axis
        edge_axes[name] = EdgeSet(
            features=0,
            senders=topo_axis,
            receivers=topo_axis,
            mask=mask_axis,
            gather_idx=None,
            gather_valid=None,
        )
    return Graph(
        node_features=0,
        edge_sets=edge_axes,
        hyper_features=None if graph.hyper_features is None else 0,
        node_mask=None if graph.node_mask is None else 0,
        hyper_mask=None if graph.hyper_mask is None else 0,
    )
