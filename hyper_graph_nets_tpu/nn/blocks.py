"""GraphNet message-passing blocks (flat + hierarchical variants).

Functional re-design of the reference block zoo:

- flat GraphNet        (reference src/migration/graphnet.py:11-124)
- HyperGraphNet        (reference src/migration/hypergraphnet.py:11-54)
- MultiScaleGraphNet   (reference src/migration/multiscalegraphnet.py:10-63)
- HeteroGraphNet       (reference src/migration/heterographnet.py:10-33)
- MultiGraphNet        (reference src/migration/multigraphnet.py:10-18)
- RepeatedGraphNet     (reference src/migration/repeatedgraphnet.py:11-22)

Semantics preserved from the reference:
- edge update: ``e' = e + MLP_name([x[snd], x[rcv], e])`` with the residual
  base being the *block-input* edge features;
- node update: ``x' = x + MLP([x, agg(e') per edge set])`` with pna
  concatenating (sum, mean, max, min) in that order;
- flat blocks update only mesh rows (``[:hyper_node_offset]`` in the
  reference); hierarchical blocks run the ordered sub-step sequence
  mesh -> up -> cross -> down with node latents visible to later sub-steps;
- multiscale re-derives inter_cluster/mesh edge updates from the block-input
  edge features each round (the reference reads ``graph.edge_sets`` which it
  never mutates in place).

TPU-first details: all gathers are ``jnp.take`` on int32 topology (static
shapes), aggregations are masked sorted-segment ops, and every MLP call is a
large ``[rows, features]`` matmul that XLA tiles onto the MXU.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from hyper_graph_nets_tpu.core.graph import EdgeSet, Graph, concat_node_tiers
from hyper_graph_nets_tpu.core.segment_ops import aggregate
from hyper_graph_nets_tpu.nn.mlp import mlp_apply, mlp_init

Array = jax.Array

# Canonical edge-set ordering: graph-construction order in the reference
# (build_graph -> balancer -> connector).  Node-update inputs concatenate
# aggregates in this order, making the weight layout deterministic.
CANONICAL_EDGE_ORDER: Tuple[str, ...] = (
    "mesh_edges",
    "world_edges",
    "balance",
    "intra_cluster_to_cluster",
    "intra_cluster_to_mesh",
    "inter_cluster",
    "inter_cluster_world",
)

MESH_TIER_SETS = ("mesh_edges", "world_edges", "balance")
UP_SETS = ("intra_cluster_to_cluster",)
CROSS_SETS = ("inter_cluster", "inter_cluster_world")
DOWN_SETS = ("intra_cluster_to_mesh",)

HIERARCHICAL_ARCHITECTURES = ("hyper", "multiscale", "hetero")


@dataclasses.dataclass(frozen=True)
class GNNConfig:
    """Static network schema (shapes derive from this, not from data)."""

    output_size: int
    node_in_dim: int
    edge_in_dims: Tuple[Tuple[str, int], ...]  # (edge set name, raw feature dim)
    latent_size: int = 128
    num_layers: int = 2
    message_passing_steps: int = 5
    aggregation: str = "pna"
    architecture: str = "none"  # none|hyper|multiscale|hetero|multi|repeated
    hyper_in_dim: Optional[int] = None
    repetitions: int = 2  # for 'repeated'
    compute_dtype: Optional[str] = None  # e.g. 'bfloat16'
    scan_unroll: int = 1  # processor scan unroll factor (compile-time/perf knob)
    # set under shard_map edge partitioning: aggregations combine local
    # partials with psum/pmax/pmin over this mesh axis (parallel/halo.py)
    axis_name: Optional[str] = None
    # set by the GSPMD train step (parallel/sharding.py) when edges shard
    # over a mesh axis AND the topology carries a stacked per-shard band
    # plan: fused edge blocks run as an internal shard_map region with a
    # custom VJP (ops/pallas/fused_block.fused_edge_block_spmd) — the
    # trainable multi-chip fused path.  (A pallas_call is opaque to the
    # GSPMD partitioner, so the kernel cannot run under pjit directly.)
    spmd_mesh: Optional[object] = None
    spmd_axis: str = "graph"
    # with axis_name set: combine partials via the Pallas RDMA ring
    # (ops/pallas/ring.py) instead of XLA collectives
    halo_ring: bool = False
    # with axis_name set + a band plan carrying ov_sched: ONE kernel fuses
    # the chunked compute grid with the banded double-buffered ring, so a
    # band's partials ride ICI while later chunks compute
    # (ops/pallas/fused_overlap.py — compute-overlapped boundary exchange)
    halo_overlap: bool = False
    # static ((axis, size), ...) of the full mesh, in mesh order; required
    # by the RDMA kernels on multi-axis meshes (logical ids are linearized
    # mesh ids, so a ring must keep the other axes' coordinates fixed)
    halo_mesh_axes: Tuple = ()
    # rematerialize each MP block in the backward pass (jax.checkpoint):
    # trades ~1/3 more FLOPs for O(1) instead of O(mp_steps) activation
    # memory — enables deep processors on large meshes
    remat: bool = False
    # 'xla': XLA AD differentiates gather_aggregate (backward = transposed
    # scatter); 'gather': custom VJP routes node cotangents back to edges
    # with pure gathers (segment_ops.pna_gather) — scatter-free backward,
    # the TPU fast path for static topology + pna; 'sorted': Pallas
    # segmented-scan kernel (ops/pallas/segment_pna) for receiver-sorted
    # edge sets (sorted_edge_sets), scatter-free fwd AND bwd on the MXU;
    # 'fused': Pallas kernel fusing gather -> edge MLP -> LN -> pna into
    # one VMEM pass (ops/pallas/fused_block) for edge sets carrying a
    # band plan — falls back per-set to the unfused path otherwise
    agg_vjp: str = "xla"
    # forward flavor for agg_vjp='fused': 'kernel' (default — the full
    # Pallas fwd kernel) or 'xla' (XLA forward + Pallas backward; see
    # _fused_update_and_agg)
    fused_fwd: str = "kernel"
    # batch elements per fused-kernel FORWARD grid step (grid
    # amortization, config model.fused_pb): >1 shrinks the serialized
    # forward grid at ~pb x the per-step VMEM footprint — the forward
    # shares its one-hots / packed scan / selection matmul across the pb
    # elements; pair with fused_chunk/the scoped-VMEM limit
    fused_pb: int = 1
    # independent backward knob (config model.fused_pb_bwd, default 1):
    # the backward's per-element routing/RMW chains and f32 residents
    # grow with pb, so amortizing it measures SLOWER (ROADMAP 5c round-5)
    fused_pb_bwd: int = 1
    # backward flavor (config model.fused_bwd): 'remat' (default — the
    # backward kernel re-runs the forward chunk) or 'stream' (the
    # under-grad forward saves a1/a2 + LN stats and the backward skips
    # the remat chain).  stream wins only where compute outweighs its
    # extra HBM traffic — measured faster at chunk 256, slower at 512+
    fused_bwd: str = "remat"
    # edge sets whose receivers are non-decreasing with masked edges at the
    # tail (core.mesh.cells_to_edges lexsorts by receiver) — eligible for
    # the 'sorted' Pallas aggregation path
    sorted_edge_sets: Tuple[str, ...] = ("mesh_edges",)

    @property
    def edge_sets(self) -> Tuple[str, ...]:
        return tuple(
            n for n in CANONICAL_EDGE_ORDER if n in dict(self.edge_in_dims)
        )

    @property
    def hierarchical(self) -> bool:
        return self.architecture in HIERARCHICAL_ARCHITECTURES

    @property
    def naggs(self) -> int:
        return 4 if self.aggregation == "pna" else 1

    @property
    def cd(self):
        return None if self.compute_dtype is None else jnp.dtype(self.compute_dtype)

    def mlp_widths(self, output_size: int) -> Tuple[int, ...]:
        return tuple([self.latent_size] * self.num_layers + [output_size])

    def node_update_in_dim(self, num_edge_sets: int) -> int:
        return self.latent_size * (1 + self.naggs * num_edge_sets)


def _subset(cfg: GNNConfig, names: Sequence[str]) -> Tuple[str, ...]:
    registered = set(cfg.edge_sets)
    return tuple(n for n in names if n in registered)


def block_init(key: Array, cfg: GNNConfig) -> dict:
    """Initialize one message-passing block's parameters."""
    L = cfg.latent_size
    widths = cfg.mlp_widths(L)
    params: dict = {"edge_models": {}}
    for name in cfg.edge_sets:
        key, k = jax.random.split(key)
        params["edge_models"][name] = mlp_init(k, 3 * L, widths)

    arch = cfg.architecture
    if arch in ("hyper", "multiscale"):
        mesh_sets = _subset(cfg, MESH_TIER_SETS)
        cross_sets = _subset(cfg, CROSS_SETS)
        key, k1, k2, k3 = jax.random.split(key, 4)
        params["node_model_cross"] = mlp_init(
            k1, cfg.node_update_in_dim(len(mesh_sets)), widths
        )
        params["hyper_node_model_up"] = mlp_init(
            k2, cfg.node_update_in_dim(len(_subset(cfg, UP_SETS))), widths
        )
        params["node_model_down"] = mlp_init(
            k3, cfg.node_update_in_dim(len(_subset(cfg, DOWN_SETS))), widths
        )
        if arch == "hyper":
            key, k = jax.random.split(key)
            params["hyper_node_model_cross"] = mlp_init(
                k, cfg.node_update_in_dim(len(cross_sets)), widths
            )
        else:
            params["hyper_node_models_cross"] = []
            for _ in range(3):
                key, k = jax.random.split(key)
                params["hyper_node_models_cross"].append(
                    mlp_init(k, cfg.node_update_in_dim(len(cross_sets)), widths)
                )
    else:
        # flat / hetero / multi / repeated: one node model over all edge sets
        key, k = jax.random.split(key)
        params["node_model_cross"] = mlp_init(
            k, cfg.node_update_in_dim(len(cfg.edge_sets)), widths
        )
        if arch == "hetero":
            key, k = jax.random.split(key)
            params["hyper_node_model_cross"] = mlp_init(
                k, cfg.node_update_in_dim(len(cfg.edge_sets)), widths
            )
    return params


def _present(cfg: GNNConfig, graph: Graph, names: Sequence[str]) -> Tuple[str, ...]:
    return tuple(n for n in names if n in graph.edge_sets)


def _update_edge_features(
    params: dict, all_nodes: Array, es: EdgeSet, cfg: GNNConfig
) -> Array:
    """Edge update ``e + MLP([x[snd], x[rcv], e])`` with a factored first layer.

    ``concat([s, r, e]) @ W1 == s @ Ws + r @ Wr + e @ We`` (W1 split row-wise),
    so the sender/receiver contributions are computed once per *node* (~5x
    fewer rows than edges on a mesh) and gathered at latent width — cutting
    both MXU FLOPs and HBM traffic vs gather-concat-matmul.  Mathematically
    identical to the reference formulation (graphnet.py:22-32).
    """
    from hyper_graph_nets_tpu.nn.mlp import _dense, mlp_apply_tail

    L = all_nodes.shape[-1]
    l0 = params["layers"][0]
    b1 = l0["b"]
    if "w_q" in l0:
        # int8 inference (nn.quant): the factored row split of the first
        # layer preserves the per-output-channel scales
        from hyper_graph_nets_tpu.nn.quant import dense_int8

        w1q, ws = l0["w_q"], l0["wscale"]  # [(2*L + Fe), latent], [latent]
        latent = w1q.shape[-1]
        node_part = dense_int8(
            all_nodes,
            jnp.concatenate([w1q[:L], w1q[L : 2 * L]], axis=-1),
            jnp.concatenate([ws, ws], axis=-1),
        )
        s_part = node_part[..., :latent]
        r_part = node_part[..., latent:]
        e_part = dense_int8(es.features, w1q[2 * L :], ws)
    else:
        w1 = l0["w"]  # [(2*L + Fe), latent]
        node_part = _dense(
            all_nodes, jnp.concatenate([w1[:L], w1[L : 2 * L]], axis=-1), cfg.cd
        )
        s_part = node_part[..., : w1.shape[-1]]
        r_part = node_part[..., w1.shape[-1] :]
        e_part = _dense(es.features, w1[2 * L :], cfg.cd)
    if cfg.cd is not None:
        b1 = b1.astype(cfg.cd)
    if (
        cfg.agg_vjp == "gather"
        and es.snd_gather_idx is not None
        and es.gather_idx is not None
        and _gather_dense_ok(es)
        and _gather_dense_ok(es, es.snd_gather_idx)
    ):
        # scatter-free backward: cotangents of the sender/receiver gathers
        # route through the static inverse incidence (segment_ops.gather_rows)
        from hyper_graph_nets_tpu.core.segment_ops import gather_rows

        s_rows = gather_rows(
            s_part, es.senders, es.snd_gather_idx, es.snd_gather_valid
        )
        r_rows = gather_rows(
            r_part, es.receivers, es.gather_idx, es.gather_valid
        )
    else:
        s_rows = jnp.take(s_part, es.senders, axis=0)
        r_rows = jnp.take(r_part, es.receivers, axis=0)
    h = s_rows + r_rows + e_part + b1
    return es.features + mlp_apply_tail(params, h, cfg.cd, from_layer=1)


def _fused_eligible(eparams: dict, es: EdgeSet, cfg: GNNConfig) -> bool:
    """Edge sets the fused Pallas MP-block kernel can take whole.

    Requires a band plan (banded receiver-sorted numbering, built host-side
    in models/base.build_topology), pna aggregation, no shard_map axis, and
    the standard processor MLP shape [3L -> L -> L -> L] + LayerNorm that
    the kernel hard-codes.
    """
    return (
        cfg.agg_vjp == "fused"
        and cfg.aggregation == "pna"
        and cfg.axis_name is None
        and es.band_plan is not None
        and _fused_mlp_shape_ok(eparams, es, cfg)
    )


def _fused_mlp_shape_ok(eparams: dict, es: EdgeSet, cfg: GNNConfig) -> bool:
    """The [3L -> L -> L -> L] + LayerNorm float-weight structure the
    fused kernel hard-codes (int8 inference params stay unfused)."""
    L = cfg.latent_size
    layers = eparams["layers"]
    return (
        len(layers) == 3
        and "ln" in eparams
        and "w" in layers[0]
        and layers[0]["w"].shape == (3 * L, L)
        and layers[1]["w"].shape == (L, L)
        and layers[2]["w"].shape == (L, L)
        and es.features.shape[-1] == L
    )


def _fused_update_and_agg(
    eparams: dict, all_nodes: Array, es: EdgeSet, cfg: GNNConfig, num_total: int
) -> Tuple[Array, Array]:
    """Fused edge update + pna aggregate (ops/pallas/fused_block).

    Same factored first layer as _update_edge_features; the gather, MLP
    tail, LayerNorm, residual and pna all run inside one Pallas kernel.
    """
    from hyper_graph_nets_tpu.nn.mlp import _dense
    from hyper_graph_nets_tpu.ops.pallas.fused_block import (
        fused_edge_block,
        fused_edge_block_batchable,
        fused_edge_block_collective,
        fused_edge_block_hybrid,
        fused_edge_block_spmd,
    )

    L = all_nodes.shape[-1]
    w1 = eparams["layers"][0]["w"]
    node_part = _dense(
        all_nodes, jnp.concatenate([w1[:L], w1[L : 2 * L]], axis=-1), cfg.cd
    )
    sp, rp = node_part[..., :L], node_part[..., L:]
    feats = es.features if cfg.cd is None else es.features.astype(cfg.cd)
    weights = {
        "we": w1[2 * L :],
        "w2": eparams["layers"][1]["w"],
        "w3": eparams["layers"][2]["w"],
        "b1": eparams["layers"][0]["b"],
        "b2": eparams["layers"][1]["b"],
        "b3": eparams["layers"][2]["b"],
        "lns": eparams["ln"]["scale"],
        "lnb": eparams["ln"]["bias"],
    }
    if (
        cfg.fused_bwd != "remat" or cfg.fused_pb > 1 or cfg.fused_pb_bwd > 1
    ) and (
        cfg.spmd_mesh is not None
        or cfg.axis_name is not None
        or cfg.fused_fwd == "xla"
    ):
        import warnings

        warnings.warn(
            "fused_bwd/fused_pb/fused_pb_bwd apply only to the "
            "single-device full-kernel path; the spmd/collective/hybrid "
            "branch selected here ignores them (remat backward, pb=1).",
            stacklevel=2,
        )
    if cfg.spmd_mesh is not None:
        # GSPMD train step: trainable shard_map region with custom VJP
        # (both Pallas kernels run per edge shard; collectives carry the
        # pna partials forward and the node/weight cotangents backward)
        e2, agg = fused_edge_block_spmd(
            feats, sp, rp, weights, es.band_plan, num_total,
            cfg.spmd_mesh, cfg.spmd_axis,
        )
    elif cfg.axis_name is not None:
        if cfg.halo_overlap and es.band_plan.ov_sched is not None:
            # compute-overlapped boundary exchange: one kernel runs the
            # chunked compute AND the banded double-buffered RDMA ring
            from hyper_graph_nets_tpu.ops.pallas.fused_overlap import (
                fused_edge_block_collective_overlap,
            )

            e2, agg = fused_edge_block_collective_overlap(
                feats, sp, rp, weights, es.band_plan, num_total,
                cfg.axis_name, mesh_axes=cfg.halo_mesh_axes,
            )
        else:
            # shard_map edge partitioning (forward-only halo path): local
            # kernel partials + psum/pmax/pmin over the mesh axis
            e2, agg = fused_edge_block_collective(
                feats, sp, rp, weights, es.band_plan, num_total,
                cfg.axis_name,
            )
    elif (
        cfg.fused_fwd == "xla"
        and es.gather_idx is not None
        and es.gather_idx.ndim == 2
        and _gather_dense_ok(es)
    ):
        # opt-in hybrid: XLA forward (CSR-gather pna) + Pallas remat
        # backward.  Measured SLOWER than the full kernel at bench scale
        # (78 vs 70 ms — the custom-VJP boundary blocks XLA's cross-stage
        # fusion), kept as an option for shapes where the forward kernel's
        # serialized grid dominates.
        e2, agg = fused_edge_block_hybrid(
            feats, sp, rp, weights, es.band_plan, num_total,
            es.senders, es.receivers, es.gather_idx, es.gather_valid,
        )
    elif cfg.fused_pb > 1 or cfg.fused_pb_bwd > 1:
        # grid amortization: the custom-vmap wrapper hands the REAL frame
        # batch to one kernel launch (pb elements per grid step)
        e2, agg = fused_edge_block_batchable(
            feats, sp, rp, weights, es.band_plan, num_total,
            pb=cfg.fused_pb, pb_bwd=cfg.fused_pb_bwd, bwd=cfg.fused_bwd,
        )
    else:
        e2, agg = fused_edge_block(
            feats, sp, rp, weights, es.band_plan, num_total,
            bwd=cfg.fused_bwd,
        )
    if cfg.cd is not None:
        agg = agg.astype(cfg.cd)
    return e2, agg


def _gather_dense_ok(es: EdgeSet, idx: Optional[Array] = None) -> bool:
    """Is the dense [rows, d_max] gather matrix worth its padding waste?

    The gather path materializes [rows, d_max, L]; when the receiver
    in-degree is skewed (cluster-tier sets: d_max ~ largest cluster size,
    so rows x d_max is ~100x the edge count) that tensor dwarfs the edge
    stream and the "fast path" becomes the bottleneck (measured: the up
    sub-step alone was 31 ms of a 33 ms hierarchical block).  Scatter
    aggregation is cheaper past ~4x padding waste.  Also gates the
    scatter-free gather_rows backward (same inverse-incidence tensor).
    """
    gshape = (es.gather_idx if idx is None else idx).shape
    return gshape[-2] * gshape[-1] <= 4 * es.num_edges


def _fused_collective_eligible(
    eparams: dict, es: EdgeSet, cfg: GNNConfig
) -> bool:
    """Fused path under shard_map edge partitioning (forward-only halo).

    Same structural requirements as _fused_eligible, but for an
    axis_name-carrying config with an unbatched local edge shard whose
    band plan is the local view of a stacked sharded plan
    (ops.pallas.fused_block.build_sharded_band_plans).
    """
    return (
        cfg.agg_vjp == "fused"
        and cfg.aggregation == "pna"
        and cfg.axis_name is not None
        and es.band_plan is not None
        and es.features.ndim == 2
        and _fused_mlp_shape_ok(eparams, es, cfg)
    )


def _aggregate_sets(
    edge_feats: Dict[str, Array],
    graph: Graph,
    names: Sequence[str],
    num_total: int,
    cfg: GNNConfig,
    precomputed: Optional[Dict[str, Array]] = None,
    window: Optional[Tuple[int, int]] = None,
) -> Array:
    """Concatenated per-set aggregates over node rows.

    ``window=(lo, hi)``: aggregate into rows [lo, hi) only — the
    hierarchical sub-steps update one tier at a time, and every named
    set's receivers lie in that tier by construction (connector builds
    up/cross sets with hyper-row receivers, down/mesh sets with mesh-row
    receivers), so scattering into the full [num_total] row space just
    burns HBM: on HGN plate the hyper tier is K~16 rows of a ~1.4k-row
    space.  Rows outside the window receive nothing by construction.
    """
    from hyper_graph_nets_tpu.core.segment_ops import (
        collective_aggregate,
        gather_aggregate,
    )

    lo, hi = (0, num_total) if window is None else window
    rows = hi - lo

    def shifted_receivers(es):
        if lo == 0:
            return es.receivers
        r = es.receivers - lo
        if es.mask is not None and es.mask.ndim == r.ndim:
            # padded edges may carry row-0 receiver ids, which shift
            # negative; route them to the dropped sentinel row instead
            r = jnp.where(es.mask > 0, r, rows)
        return r

    parts = []
    for name in names:
        if precomputed is not None and name in precomputed:
            parts.append(precomputed[name][..., lo:hi, :])
            continue
        es = graph.edge_sets[name]
        if cfg.axis_name is not None:
            # shard_map edge partitioning: local partials + psum/pmax/pmin
            # (or one Pallas RDMA ring pass when halo_ring is set);
            # aggregate the full row space (the collective layout assumes
            # it), then slice the window
            parts.append(
                collective_aggregate(
                    edge_feats[name], es.receivers, num_total, cfg.aggregation,
                    es.mask, cfg.axis_name, ring=cfg.halo_ring,
                    mesh_axes=cfg.halo_mesh_axes,
                )[..., lo:hi, :]
            )
            continue
        if (
            lo == 0
            and cfg.agg_vjp == "sorted"
            and cfg.aggregation == "pna"
            and name in cfg.sorted_edge_sets
        ):
            # Pallas segmented-scan kernel: per-node-block contiguous edge
            # ranges -> VPU segment scans + one-hot MXU selection; no
            # scatters or gathers in either pass (ops/pallas/segment_pna).
            from hyper_graph_nets_tpu.ops.pallas.segment_pna import (
                MAX_EDGE_BLOCK_BYTES,
                pna_sorted,
            )

            f = edge_feats[name]
            if f.shape[-2] * f.shape[-1] * 4 <= MAX_EDGE_BLOCK_BYTES:
                seg_max = (
                    es.gather_idx.shape[-1]
                    if es.gather_idx is not None
                    else 64
                )
                parts.append(
                    pna_sorted(f, es.receivers, es.mask, hi, seg_max)
                )
                continue
        if es.gather_idx is not None and _gather_dense_ok(es):
            # fast path: one gather over the static neighbor matrix feeds
            # all pna reductions (sum/mean/max/min) in a single pass.
            # gather_idx/gather_valid are per-receiver-row arrays, so the
            # window is a static row slice.
            gidx = es.gather_idx[..., lo:hi, :]
            gval = es.gather_valid[..., lo:hi, :]
            if cfg.agg_vjp == "gather" and cfg.aggregation == "pna" and lo == 0:
                from hyper_graph_nets_tpu.core.segment_ops import pna_gather

                em = es.mask
                if em is None:
                    em = jnp.ones(edge_feats[name].shape[:-1], jnp.float32)
                parts.append(
                    pna_gather(
                        edge_feats[name], gidx, gval, es.receivers, em,
                    )
                )
                continue
            parts.append(
                gather_aggregate(
                    edge_feats[name], gidx, gval, cfg.aggregation,
                )
            )
            continue
        # NB: the sorted-segment hint is intentionally NOT passed — XLA's
        # unsorted scatter path measures ~6x faster on TPU v5e for these
        # shapes than the indices_are_sorted=True specialization.
        parts.append(
            aggregate(
                edge_feats[name],
                shifted_receivers(es),
                rows,
                cfg.aggregation,
                es.mask,
            )
        )
    return jnp.concatenate(parts, axis=-1)


def _replace_edge_features(graph: Graph, new_feats: Dict[str, Array]) -> Graph:
    sets = dict(graph.edge_sets)
    for name, f in new_feats.items():
        sets[name] = sets[name].replace(features=f)
    return graph.replace(edge_sets=sets)


def _flat_apply_once(params: dict, graph: Graph, cfg: GNNConfig) -> Graph:
    names = _present(cfg, graph, cfg.edge_sets)
    all_nodes = concat_node_tiers(graph)
    num_total = all_nodes.shape[-2]
    n_mesh = graph.num_nodes

    new_feats: Dict[str, Array] = {}
    fused_aggs: Dict[str, Array] = {}
    for name in names:
        es = graph.edge_sets[name]
        eparams = params["edge_models"][name]
        if _fused_eligible(eparams, es, cfg) or _fused_collective_eligible(
            eparams, es, cfg
        ):
            new_feats[name], fused_aggs[name] = _fused_update_and_agg(
                eparams, all_nodes, es, cfg, num_total
            )
        else:
            new_feats[name] = _update_edge_features(eparams, all_nodes, es, cfg)
    agg = _aggregate_sets(new_feats, graph, names, num_total, cfg, fused_aggs)
    features = jnp.concatenate([all_nodes, agg], axis=-1)

    if cfg.architecture == "hetero" and graph.hyper_features is not None:
        mesh_upd = mlp_apply(params["node_model_cross"], features[:n_mesh], cfg.cd)
        hyper_upd = mlp_apply(
            params["hyper_node_model_cross"], features[n_mesh:], cfg.cd
        )
        graph = graph.replace(
            node_features=graph.node_features + mesh_upd,
            hyper_features=graph.hyper_features + hyper_upd,
        )
    else:
        mesh_upd = mlp_apply(params["node_model_cross"], features[:n_mesh], cfg.cd)
        graph = graph.replace(node_features=graph.node_features + mesh_upd)
    return _replace_edge_features(graph, new_feats)


def _hierarchical_apply(params: dict, graph: Graph, cfg: GNNConfig) -> Graph:
    """Shared body for hyper/multiscale blocks (ordered sub-step sequence)."""
    multiscale = cfg.architecture == "multiscale"
    new_feats: Dict[str, Array] = {}
    fused_aggs: Dict[str, Array] = {}
    n_mesh = graph.num_nodes

    # each sub-step's node_update directly follows its upd_edges on the
    # same node state, so the fused update+aggregate kernel is valid per
    # sub-step (band plans exist only for static receiver-sorted sets,
    # i.e. mesh_edges; the cluster-tier sets stay on the unfused path)
    def upd_edges(names: Sequence[str]) -> Tuple[str, ...]:
        present = _present(cfg, graph, names)
        all_nodes = concat_node_tiers(graph)
        num_total = all_nodes.shape[-2]
        for name in present:
            es = graph.edge_sets[name]
            eparams = params["edge_models"][name]
            if _fused_eligible(eparams, es, cfg):
                new_feats[name], fused_aggs[name] = _fused_update_and_agg(
                    eparams, all_nodes, es, cfg, num_total
                )
            else:
                new_feats[name] = _update_edge_features(
                    eparams, all_nodes, es, cfg
                )
                fused_aggs.pop(name, None)
        return present

    def node_update(names: Sequence[str], model: dict, tier: str) -> Graph:
        all_nodes = concat_node_tiers(graph)
        num_total = all_nodes.shape[-2]
        # aggregate into the updated tier's rows only: up/cross receivers
        # are hyper rows, down/mesh receivers are mesh rows (connector
        # construction), so the other tier's rows receive nothing.
        # Measured (TPU v5e, HGN plate): the mesh window is free, but
        # shifting the hyper tier's scatter into its own tiny [Kp~16]
        # row space is 6.6 ms/step SLOWER than scattering into the full
        # [N+Kp] space and slicing — XLA's TPU scatter falls off its
        # fast path at tiny output row counts.  So: window mesh-tier
        # updates; aggregate hyper-tier updates at full rows and slice.
        if tier == "mesh":
            agg = _aggregate_sets(
                new_feats, graph, names, num_total, cfg, fused_aggs,
                window=(0, n_mesh),
            )
        else:
            agg = _aggregate_sets(
                new_feats, graph, names, num_total, cfg, fused_aggs,
            )[..., n_mesh:, :]
        tier_nodes = (
            all_nodes[..., : n_mesh, :]
            if tier == "mesh"
            else all_nodes[..., n_mesh:, :]
        )
        features = jnp.concatenate([tier_nodes, agg], axis=-1)
        upd = mlp_apply(model, features, cfg.cd)
        if tier == "mesh":
            return graph.replace(node_features=graph.node_features + upd)
        return graph.replace(hyper_features=graph.hyper_features + upd)

    # 1. mesh/world edges -> mesh nodes
    mesh_sets = upd_edges(MESH_TIER_SETS)
    graph = node_update(mesh_sets, params["node_model_cross"], "mesh")
    # 2. up edges -> hyper nodes
    up_sets = upd_edges(UP_SETS)
    graph = node_update(up_sets, params["hyper_node_model_up"], "hyper")
    # 3. cross edges -> hyper nodes (3 rounds for multiscale)
    rounds = 3 if multiscale else 1
    for i in range(rounds):
        cross_sets = upd_edges(CROSS_SETS)
        model = (
            params["hyper_node_models_cross"][i]
            if multiscale
            else params["hyper_node_model_cross"]
        )
        graph = node_update(cross_sets, model, "hyper")
    # 4. down edges -> mesh nodes
    down_sets = upd_edges(DOWN_SETS)
    graph = node_update(down_sets, params["node_model_down"], "mesh")
    # 5. multiscale: second mesh edge/node update from block-input edge features
    if multiscale:
        mesh_sets = upd_edges(MESH_TIER_SETS)
        graph = node_update(mesh_sets, params["node_model_cross"], "mesh")

    return _replace_edge_features(graph, new_feats)


def block_apply(params: dict, graph: Graph, cfg: GNNConfig) -> Graph:
    arch = cfg.architecture
    if arch in ("hyper", "multiscale"):
        return _hierarchical_apply(params, graph, cfg)
    if arch == "repeated":
        for _ in range(cfg.repetitions):
            graph = _flat_apply_once(params, graph, cfg)
        return graph
    # none / multi / hetero
    return _flat_apply_once(params, graph, cfg)
