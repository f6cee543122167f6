"""Multi-chip distribution: data-parallel x edge-parallel graph sharding.

The reference is strictly single-process/single-device (SURVEY.md §2
parallelism table; no torch.distributed anywhere).  This module adds the
TPU-native scaling path:

- a 2-axis device mesh ``('data', 'graph')``: trajectories/frame-batches
  shard over ``data``; each graph's *edge dimension* shards over ``graph``
  (the mesh-graph analogue of sequence parallelism — SURVEY.md §5);
- node features stay replicated across ``graph`` (nodes are ~5x fewer than
  edges and the node MLP is cheap); segment aggregations over sharded edges
  produce partial sums that XLA's SPMD partitioner completes with
  all-reduces over ICI;
- the whole train step is ONE jitted program with sharding annotations
  (``NamedSharding`` inputs + ``with_sharding_constraint`` on edge
  activations) — gradients and normalizer statistics come out correct by
  construction because XLA partitions a single global program, rather than
  hand-written psums.

Collectives ride the ``graph`` mesh axis; place that axis on the
ICI-connected dimension of the slice.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hyper_graph_nets_tpu.core.graph import EdgeSet, Graph
from hyper_graph_nets_tpu.models.base import ModelState, SystemModel, Topology
from hyper_graph_nets_tpu.training.trainer import TrainState, Trainer, add_noise

Array = jax.Array


def make_mesh(
    data: int = 1, graph: int = 1, devices=None
) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if data * graph > devices.size:
        raise ValueError(
            f"mesh {data}x{graph} needs {data * graph} devices, have {devices.size}"
        )
    devs = devices[: data * graph].reshape(data, graph)
    return Mesh(devs, axis_names=("data", "graph"))


def pad_to_multiple(arr: np.ndarray, multiple: int, pad_value=0) -> np.ndarray:
    n = arr.shape[0]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return arr
    pad = np.full((target - n,) + arr.shape[1:], pad_value, arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def shard_topology(
    topo: Topology,
    mesh: Mesh,
    band_plans: Optional[bool] = None,
    overlap_bands: Optional[int] = None,
) -> Topology:
    """Pad edges to a multiple of the graph axis and device_put sharded.

    Padded edges use ``receiver = num_nodes - 1`` (preserving the
    receiver-sorted invariant) with mask 0.

    When the input topology carries a band plan (``agg_vjp: fused``), a
    stacked per-shard plan is built by default
    (ops.pallas.fused_block.build_sharded_band_plans): the GSPMD train step
    and the shard_map halo forward both consume it — training runs the
    kernels inside a custom-VJP shard_map region
    (fused_edge_block_spmd), which is how the plan survives pjit.
    Pass ``band_plans=False`` to force the unfused sharded path.
    """
    g = mesh.shape["graph"]
    n_valid = len(topo.senders)
    if band_plans is None:
        band_plans = topo.band_plan is not None
    use_overlap = bool(
        overlap_bands and band_plans and topo.band_plan is not None
    )
    if use_overlap:
        # the overlap schedule needs every shard to walk the whole
        # receiver range (chunk round-robin); pad to chunk*g first
        from hyper_graph_nets_tpu.ops.pallas.fused_block import default_chunk

        chunk = default_chunk()
        senders = pad_to_multiple(topo.senders, chunk * g, pad_value=0)
        receivers = pad_to_multiple(
            topo.receivers, chunk * g, pad_value=topo.num_nodes - 1
        )
    else:
        senders = pad_to_multiple(topo.senders, g, pad_value=0)
        receivers = pad_to_multiple(
            topo.receivers, g, pad_value=topo.num_nodes - 1
        )
    mask = np.zeros(len(senders), np.float32)
    mask[:n_valid] = 1.0
    shard_num_valid = None
    if use_overlap:
        from hyper_graph_nets_tpu.ops.pallas.fused_overlap import (
            chunk_roundrobin_permutation,
        )

        perm = chunk_roundrobin_permutation(len(senders), g, chunk)
        senders, receivers, mask = senders[perm], receivers[perm], mask[perm]
        shard_num_valid = (
            mask.reshape(g, -1).sum(axis=1).astype(np.int64).tolist()
        )
    band_plan = None
    if band_plans and topo.band_plan is not None:
        from hyper_graph_nets_tpu.ops.pallas.fused_block import (
            build_sharded_band_plans,
        )

        band_plan = build_sharded_band_plans(
            senders, receivers, topo.num_nodes, g, num_valid=n_valid,
            overlap_bands=overlap_bands, shard_num_valid=shard_num_valid,
        )
    sharding = NamedSharding(mesh, P("graph"))
    # NB: no gather matrix here — with edges sharded over 'graph', scatter
    # segment ops partition into local partial sums + an all-reduce, which is
    # the intended collective pattern; a global gather matrix would instead
    # force an all-gather of edge features.
    return Topology(
        senders=jax.device_put(senders, sharding),
        receivers=jax.device_put(receivers, sharding),
        num_nodes=topo.num_nodes,
        mask=jax.device_put(jnp.asarray(mask), sharding),
        # model-specific static aux (e.g. plate obstacle indices) is small
        # and stays replicated
        aux=topo.aux,
        world_cap=topo.world_cap,
        band_plan=band_plan,
    )


def constrain_graph(graph: Graph, mesh: Mesh) -> Graph:
    """Force the intended layout: batch over 'data', edges over 'graph'."""
    def c(x, spec):
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    batch = graph.node_features.ndim == 3
    node_spec = P("data", None, None) if batch else P(None, None)
    edge_feat_spec = P("data", "graph", None) if batch else P("graph", None)

    new_sets = {}
    for name, es in graph.edge_sets.items():
        idx_spec = P("graph") if es.senders.ndim == 1 else P("data", "graph")
        if es.mask is None:
            mask = None
        else:
            # 1-D masks shard over 'graph'; batched 2-D over ('data','graph')
            mask = c(es.mask, P(*("data", "graph")[-es.mask.ndim :]))
        band_plan = es.band_plan
        n_graph = mesh.shape["graph"]
        stacked = (
            band_plan is not None
            and band_plan.w_s.shape[0] % n_graph == 0
            # stacked plans concatenate the chunk axis across shards, so a
            # per-shard view has w_s.shape[1] chunks; a non-stacked plan
            # (e.g. an RMP cluster-tier set) has snd_col.shape[0] chunks
            # total regardless of its subwindow count
            and band_plan.snd_col.shape[0]
            == band_plan.w_s.shape[1] * n_graph
        )
        if band_plan is not None and not stacked:
            # non-stacked plan (e.g. an RMP cluster-tier set): the in-step
            # shard_map region needs one plan view per 'graph' shard, so
            # these sets fall back to the unfused sharded aggregation
            band_plan = None
        if band_plan is not None:
            # stacked per-shard plan: leading (chunk) axis over 'graph' so
            # the in-step shard_map region finds each device's local view
            # already resident
            from hyper_graph_nets_tpu.ops.pallas.fused_block import (
                band_plan_specs,
            )

            band_plan = jax.tree.map(c, band_plan, band_plan_specs(P, band_plan))
        new_sets[name] = EdgeSet(
            features=c(es.features, edge_feat_spec),
            senders=c(es.senders, idx_spec),
            receivers=c(es.receivers, idx_spec),
            mask=mask,
            band_plan=band_plan,
        )
    hyper = graph.hyper_features
    if hyper is not None:
        hyper = c(hyper, node_spec)
    return graph.replace(
        node_features=c(graph.node_features, node_spec),
        edge_sets=new_sets,
        hyper_features=hyper,
    )


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_frames(frames: Dict[str, Array], mesh: Mesh) -> Dict[str, Array]:
    """Shard a [B, ...] frame batch over the 'data' axis (B % data == 0)."""
    out = {}
    for k, v in frames.items():
        spec = P("data", *([None] * (np.ndim(v) - 1)))
        out[k] = jax.device_put(jnp.asarray(v), NamedSharding(mesh, spec))
    return out


def spmd_gnn_config(model: SystemModel, topo: Topology, mesh: Mesh):
    """The model's GNN config, with the trainable fused shard_map region
    enabled when the sharded topology carries a stacked band plan."""
    import dataclasses

    cfg = model.gnn_config
    if cfg.agg_vjp == "fused" and topo.band_plan is not None:
        cfg = dataclasses.replace(cfg, spmd_mesh=mesh, spmd_axis="graph")
    return cfg


def _batched_forward_cfg(cfg, params, graph: Graph) -> Array:
    from hyper_graph_nets_tpu.core.graph import graph_batch_axes
    from hyper_graph_nets_tpu.nn.meshgraphnet import network_apply

    axes = graph_batch_axes(graph)
    return jax.vmap(lambda g: network_apply(params, g, cfg), in_axes=(axes,))(graph)


def make_spmd_train_step(trainer: Trainer, topo: Topology, mesh: Mesh, expansion=None):
    """A fully sharded train step: DP over 'data', edge-parallel over 'graph'.

    The step is the single-device train step with sharding constraints; XLA
    SPMD inserts the ICI collectives (grad all-reduce over 'data' x 'graph',
    aggregate partial-sum reduction over 'graph').  ``topo`` should come from
    :func:`shard_topology`.

    With ``agg_vjp: fused`` and a stacked band plan on the topology, the
    mesh-edge blocks run the fused Pallas kernels inside a custom-VJP
    shard_map region (fused_edge_block_spmd) — multi-chip TRAINING on the
    fused path (SURVEY.md §7.8); everything else stays GSPMD.

    With an ``expansion`` (remote message passing / balancer, the flagship
    HyperGraphNets path), the step takes an extra ``rmp_static`` pytree from
    ``expansion.prepare(...)`` — the hypergraph incidence built on host.  The
    hyper tier it adds (hyper nodes + intra/inter cluster edge sets) is
    sharded by :func:`constrain_graph` like the mesh tier: hyper node
    features replicated over 'graph', hyper edge sets partitioned over it.
    """
    model = trainer.model
    cfg = spmd_gnn_config(model, topo, mesh)

    def loss_fn(params, normalizers, frames, rmp_static, ekey):
        mstate = ModelState(params=params, normalizers=normalizers)
        graph, aux, mstate = model.make_graph(mstate, topo, frames, True)
        if expansion is not None:
            graph, mstate = expansion.expand(
                mstate, graph, frames, model,
                is_training=True, key=ekey, static=rmp_static,
            )
        graph = constrain_graph(graph, mesh)
        target, mstate = model.get_target(mstate, frames, is_training=True)

        out = _batched_forward_cfg(cfg, mstate.params, graph)
        mask = model.loss_mask(frames["node_type"]).astype(out.dtype)[..., None]
        loss = jnp.sum(jnp.square(target - out) * mask) / (
            jnp.sum(mask) * out.shape[-1]
        )
        return loss, mstate.normalizers

    def _step(tstate: TrainState, frames: Dict[str, Array], key: Array, rmp_static):
        # identical key-split pattern to Trainer.make_train_step so both
        # paths draw the same noise for the same key
        key, nkey, ekey = jax.random.split(key, 3)
        if model.noise_scale is not None:
            frames = add_noise(
                frames, model.field, model.noise_scale, model.noise_gamma, nkey
            )
        (loss, normalizers), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            tstate.model.params, tstate.model.normalizers, frames, rmp_static, ekey
        )
        import optax

        updates, opt_state = trainer.optimizer.update(
            grads, tstate.opt_state, tstate.model.params
        )
        params = optax.apply_updates(tstate.model.params, updates)
        return (
            TrainState(
                model=ModelState(params=params, normalizers=normalizers),
                opt_state=opt_state,
                step=tstate.step + 1,
            ),
            loss,
        )

    if expansion is None:

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(tstate, frames, key):
            return _step(tstate, frames, key, None)

    else:

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(tstate, frames, key, rmp_static):
            return _step(tstate, frames, key, rmp_static)

    return train_step


def make_sharded_forward(model: SystemModel, topo: Topology, mesh: Mesh, expansion=None):
    """Edge-parallel inference forward (for scaling benchmarks and parity tests)."""
    cfg = spmd_gnn_config(model, topo, mesh)

    def _fwd(mstate: ModelState, frames: Dict[str, Array], rmp_static) -> Array:
        graph, _, _ = model.make_graph(mstate, topo, frames, False)
        if expansion is not None:
            graph, _ = expansion.expand(
                mstate, graph, frames, model, is_training=False, static=rmp_static
            )
        graph = constrain_graph(graph, mesh)
        return _batched_forward_cfg(cfg, mstate.params, graph)

    if expansion is None:

        @jax.jit
        def fwd(mstate, frames):
            return _fwd(mstate, frames, None)

    else:

        @jax.jit
        def fwd(mstate, frames, rmp_static):
            return _fwd(mstate, frames, rmp_static)

    return fwd
