"""System-model base: shared state containers and the model protocol.

Re-design of reference src/model/abstract_system_model.py:11-190.  A model is
a *static-config* Python object whose methods are pure functions over an
explicit :class:`ModelState` pytree (network params + normalizer states), so
every method jit/vmap/scans cleanly.

Topology (edge indices from cells) is extracted once per trajectory on host
(:func:`build_topology`) and compiled into the step functions as static-shape
int32 arrays — the TPU-native replacement for the reference's per-frame
``triangles_to_edges`` calls (reference src/model/flag.py:76-78).
"""
from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from hyper_graph_nets_tpu.core import normalizer as norm
from hyper_graph_nets_tpu.core.graph import EdgeSet, Graph, NodeType
from hyper_graph_nets_tpu.core.mesh import cells_to_edges
from hyper_graph_nets_tpu.nn.blocks import GNNConfig
from hyper_graph_nets_tpu.nn.meshgraphnet import network_apply, network_init

Array = jax.Array


@struct.dataclass
class ModelState:
    """All trainable/accumulated model state as one pytree."""

    params: Any
    normalizers: Dict[str, norm.NormalizerState]


class Topology(NamedTuple):
    """Static per-trajectory mesh topology (host-derived).

    ``mask`` is None when every edge is valid; padded topologies (multi-chip
    edge sharding, cross-trajectory bucketing) carry a float mask and pad
    with ``receiver = num_nodes - 1`` so receiver-sortedness is preserved.
    """

    senders: np.ndarray  # [E] int32, sorted by receiver
    receivers: np.ndarray  # [E] int32
    num_nodes: int
    mask: Optional[np.ndarray] = None  # [E] float or None
    gather_idx: Optional[np.ndarray] = None  # [N, d_max] int32 (fast aggregation)
    gather_valid: Optional[np.ndarray] = None  # [N, d_max] float
    # sender-side inverse incidence (scatter-free edge-update backward)
    snd_gather_idx: Optional[np.ndarray] = None
    snd_gather_valid: Optional[np.ndarray] = None
    # model-specific static aux arrays (e.g. plate obstacle indices)
    aux: Optional[dict] = None
    # static world-edge capacity (plate ``max_world_edges: auto`` — sized
    # per trajectory from the data).  A plain int OUTSIDE ARRAY_FIELDS: it
    # shapes traced arrays, so it must stay a compile-time constant on the
    # topology-as-argument (bucketed) step path
    world_cap: Optional[int] = None
    # banded-window plan for the fused Pallas MP-block kernel (built when
    # the numbering is banded enough; see ops/pallas/fused_block.py)
    band_plan: Optional[object] = None

    # fields whose content may vary between same-shaped (bucketed) meshes;
    # passed as traced jit arguments on the shared-step training path
    ARRAY_FIELDS = (
        "senders", "receivers", "mask", "gather_idx", "gather_valid",
        "snd_gather_idx", "snd_gather_valid", "aux", "band_plan",
    )

    def arrays(self) -> dict:
        """The data-bearing fields as one pytree (for topology-as-argument
        jit steps; ``num_nodes`` and None-ness stay static in the template)."""
        return {
            f: getattr(self, f)
            for f in self.ARRAY_FIELDS
            if getattr(self, f) is not None
        }

    def rebuild(self, arrays: dict) -> "Topology":
        """Reattach (possibly traced) array fields onto this static template."""
        return self._replace(**arrays)

    def static_signature(self) -> tuple:
        """Hashable compile signature: one jitted step serves every topology
        with the same signature via the arrays()-argument path."""
        import jax as _jax

        arrays = self.arrays()
        leaves, treedef = _jax.tree.flatten(arrays)
        return (
            self.num_nodes,
            treedef,
            tuple(
                (tuple(x.shape), str(getattr(x, "dtype", ""))) for x in leaves
            ),
        )

    def edge_mask(self):
        return None if self.mask is None else jnp.asarray(self.mask)

    def ones_mask(self, like: Array) -> Array:
        """Edge mask broadcast to the (possibly batched) feature shape."""
        shape = like.shape[:-1]
        if self.mask is None:
            return jnp.ones(shape, jnp.float32)
        return jnp.broadcast_to(jnp.asarray(self.mask), shape)


def upgrade_512_ok(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    num_valid: Optional[int] = None,
    latent_size: int = 128,
    pb: int = 1,
) -> bool:
    """Whether 512-edge chunks are safe WITHOUT the raised scoped-VMEM
    env var: the measured fit (chunk-512 backward compiles and runs at
    the default 16 MB limit) was taken at W=WR=128, latent 128, pb 1,
    ~flag-scale row counts — gate on all of them, numpy-only."""
    from hyper_graph_nets_tpu.ops.pallas.fused_block import plan_dims

    if latent_size > 128 or pb > 1:
        return False
    d = plan_dims(senders, receivers, num_valid=num_valid, chunk=512)
    return (
        d is not None
        and d["W"] <= 128
        and d["WR"] <= 128
        and max(d["nr"], num_nodes) <= 2048
    )


def try_band_plan(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    num_valid: Optional[int] = None,
    chunk: Optional[int] = None,
    sb: Optional[int] = None,
    force_dims=None,
    latent_size: int = 128,
    pb: int = 1,
):
    """Banded-window plan for the fused MP-block kernel, or None.

    Returns None when the numbering isn't banded enough (the fused path
    then falls back to the unfused aggregation); datasets with scattered
    numberings opt in via ``ops.reorder.rcm_order`` at load time.  The
    chunk size defaults to ``fused_block.default_chunk()`` (512 when the
    scoped-VMEM limit has been raised, else 256) — upgraded to 512 when
    :func:`upgrade_512_ok` holds, so banded meshes get the ~5%
    fewer-grid-steps win without any launcher env var.

    ``sb``/``force_dims`` pin the plan's static dims — the bucketed
    path (data/bucketing.py) uses them so every trajectory in a bucket
    yields one compiled-step signature.
    """
    from hyper_graph_nets_tpu.ops.pallas.fused_block import (
        build_band_plan,
        default_chunk,
    )

    snd = np.asarray(senders)
    rcv = np.asarray(receivers)
    base = default_chunk() if chunk is None else chunk
    if (
        chunk is None
        and base < 512
        and force_dims is None
        and upgrade_512_ok(
            snd, rcv, num_nodes, num_valid=num_valid,
            latent_size=latent_size, pb=pb,
        )
    ):
        base = 512
    try:
        return build_band_plan(
            snd, rcv, num_nodes, num_valid=num_valid, chunk=base,
            sb=sb, force_dims=force_dims,
        )
    except ValueError:
        return None


def one_hot_rows(codes: Array, num_classes: int) -> Array:
    return jax.nn.one_hot(codes, num_classes, dtype=jnp.float32)


def norm_feature(rel: Array) -> Array:
    """[rel, ||rel||] feature block used by every edge featurizer."""
    return jnp.concatenate(
        [rel, jnp.sqrt(jnp.sum(rel * rel, axis=-1, keepdims=True))], axis=-1
    )


def reset_due(step: int, num_steps: int, frequency: int) -> bool:
    """Cache-reset cadence (reference src/model/flag.py:130-141)."""
    return step % math.ceil(num_steps / frequency) == 0


class SystemModel:
    """Base class holding static configuration shared by all datasets."""

    model_type = "flag"
    # subclasses define: output field name, normalizer schema, featurizers

    def __init__(self, params: dict):
        self.params = params
        model = params["model"]
        rmp_cfg = model.get("rmp", {})
        bal_cfg = model.get("graph_balancer", {})
        self.field = model["field"]
        self.output_size = model["size"]
        self.noise_scale = model.get("noise")
        self.noise_gamma = model.get("gamma", 1.0)
        self.message_passing_steps = model["message_passing_steps"]
        self.aggregation = model.get("aggregation", "pna")
        self.latent_size = model.get("latent_size", 128)
        self.num_layers = model.get("num_layers", 2)
        self.compute_dtype = model.get("compute_dtype")
        self.history = bool(model.get("history", False))

        self.use_rmp = (
            rmp_cfg.get("clustering", "none") != "none"
            and rmp_cfg.get("connector", "none") != "none"
        )
        self.architecture = rmp_cfg.get("connector", "none") if self.use_rmp else "none"
        if not self.use_rmp and rmp_cfg.get("connector") == "repeated":
            self.architecture = "repeated"
        self.use_balancer = bal_cfg.get("algorithm", "none") != "none"
        self.rmp_frequency = rmp_cfg.get("frequency", 1)
        self.balance_frequency = bal_cfg.get("frequency", 1)
        self.rmp_config = rmp_cfg
        self.balancer_config = bal_cfg
        if (
            model.get("agg_vjp") == "fused"
            and self.aggregation != "pna"
        ):
            import warnings

            warnings.warn(
                "model.agg_vjp='fused' requires aggregation='pna'; the fused "
                f"Pallas kernel will NOT run with aggregation="
                f"'{self.aggregation}' and every edge set silently falls "
                "back to the unfused path (~1.5x slower). Set "
                "aggregation: pna or drop agg_vjp: fused.",
                stacklevel=2,
            )
        # compiled-rollout cache: evaluation loops reuse jitted scan bodies
        # across epochs instead of retracing per call
        self._fn_cache: Dict[Any, Any] = {}
        # host-side eval-metric accumulator: rollout/n-step computations add
        # counters here (e.g. plate world-edge truncation); the simulator's
        # evaluators drain it via pop_eval_metrics() after each pass
        self.eval_metrics: Dict[str, float] = {}

    def pop_eval_metrics(self) -> Dict[str, float]:
        """Drain accumulated eval counters (see ``eval_metrics``)."""
        out, self.eval_metrics = self.eval_metrics, {}
        return out

    def _cached_jit(self, key, build):
        """Cache a jitted closure keyed by static call signature."""
        if key not in self._fn_cache:
            import jax as _jax

            self._fn_cache[key] = _jax.jit(build())
        return self._fn_cache[key]

    def _n_step_chunked(self, fn, starts, make_chunk_inputs, chunk):
        """Drive a vmapped n-step window fn in bounded chunks.

        Real trajectories (flag_simple T=399, n=60 -> 339 windows) cannot vmap
        all sliding windows in one program; windows run ``chunk`` at a time
        (last chunk padded by repeating the final window, padding discarded on
        host).  ``fn(*make_chunk_inputs(idx))`` must return per-window per-step
        losses ``[chunk, n+1]`` — or a ``(losses, counts)`` tuple where
        ``counts [chunk]`` are per-window world-cap truncation counts, summed
        into ``eval_metrics['world_edge_truncated']``.  Returns (mean over
        windows of per-window mean, mean over windows of last-step loss) —
        identical semantics to one full-width vmap (reference
        MeshSimulator.py:392-436).
        """
        W = len(starts)
        if W == 0:
            nan = jnp.asarray(float("nan"))
            return nan, nan
        mean_sum = 0.0
        last_sum = 0.0
        for s0 in range(0, W, chunk):
            idx = starts[s0 : s0 + chunk]
            valid = len(idx)
            if valid < chunk:
                idx = np.concatenate([idx, np.repeat(idx[-1:], chunk - valid)])
            out = fn(*make_chunk_inputs(idx))
            if isinstance(out, tuple):
                losses, counts = out
                self.eval_metrics["world_edge_truncated"] = (
                    self.eval_metrics.get("world_edge_truncated", 0)
                    + int(np.asarray(counts)[:valid].sum())
                )
            else:
                losses = out
            losses = np.asarray(losses)[:valid]
            mean_sum += float(losses.mean(axis=1).sum())
            last_sum += float(losses[:, -1].sum())
        return jnp.asarray(mean_sum / W), jnp.asarray(last_sum / W)

    def n_step_chunk_size(self, num_windows: int) -> int:
        """Windows per compiled program (config ``model.n_step_chunk``)."""
        cfg = int(self.params["model"].get("n_step_chunk", 32))
        return max(1, min(cfg, num_windows))

    @staticmethod
    def _expansion_key(expansion):
        """Stable cache-key component for an expansion.

        Prefers the config-derived ``fingerprint`` (training/expansion.py);
        otherwise keys on the object itself — the cache's strong reference
        keeps it alive, so (unlike ``id()``) the key can never alias a
        different expansion after garbage collection.
        """
        if expansion is None:
            return None
        return getattr(expansion, "fingerprint", None) or expansion

    @staticmethod
    def _static_shapes(tree) -> tuple:
        import jax as _jax

        if tree is None:
            return ()
        return tuple(
            (tuple(x.shape), str(getattr(x, "dtype", "")))
            for x in _jax.tree.leaves(tree)
        )

    # -- schema hooks (subclasses override) --------------------------------
    def edge_in_dims(self) -> Tuple[Tuple[str, int], ...]:
        raise NotImplementedError

    def node_in_dim(self) -> int:
        raise NotImplementedError

    def hyper_in_dim(self) -> Optional[int]:
        if not self.use_rmp:
            return None
        extra = 3 if self.rmp_config.get("hyper_node_features", True) else 0
        return self.node_in_dim() + extra

    def normalizer_schema(self) -> Dict[str, int]:
        raise NotImplementedError

    # -- construction ------------------------------------------------------
    @property
    def gnn_config(self) -> GNNConfig:
        return GNNConfig(
            output_size=self.output_size,
            node_in_dim=self.node_in_dim(),
            edge_in_dims=self.edge_in_dims(),
            latent_size=self.latent_size,
            num_layers=self.num_layers,
            message_passing_steps=self.message_passing_steps,
            aggregation=self.aggregation,
            architecture=self.architecture,
            hyper_in_dim=self.hyper_in_dim(),
            compute_dtype=self.compute_dtype,
            scan_unroll=self.params["model"].get("scan_unroll", 1),
            remat=self.params["model"].get("remat", False),
            agg_vjp=self.params["model"].get("agg_vjp", "xla"),
            fused_fwd=self.params["model"].get("fused_fwd", "kernel"),
            fused_pb=self.params["model"].get("fused_pb", 1),
            fused_pb_bwd=self.params["model"].get("fused_pb_bwd", 1),
            fused_bwd=self.params["model"].get("fused_bwd", "remat"),
        )

    def init_state(self, key: Array) -> ModelState:
        params = network_init(key, self.gnn_config)
        normalizers = {
            name: norm.init(size) for name, size in self.normalizer_schema().items()
        }
        return ModelState(params=params, normalizers=normalizers)

    def build_topology(
        self,
        cells: np.ndarray,
        num_nodes: Optional[int] = None,
        deform: bool = False,
    ) -> Topology:
        """Host: cells -> static topology.

        Pass ``num_nodes`` explicitly when nodes may be absent from every
        cell (plate obstacle nodes, reference plate.py:85-110 connects them
        only via world edges); otherwise it is inferred from the cells.
        """
        from hyper_graph_nets_tpu.core.mesh import receivers_to_gather

        edges = cells_to_edges(np.asarray(cells), deform=deform)
        if num_nodes is None:
            num_nodes = int(np.asarray(cells).max()) + 1
        gidx, gvalid = receivers_to_gather(edges.receivers, num_nodes)
        sidx, svalid = receivers_to_gather(edges.senders, num_nodes)
        return Topology(
            senders=edges.senders,
            receivers=edges.receivers,
            num_nodes=num_nodes,
            gather_idx=gidx,
            gather_valid=gvalid,
            snd_gather_idx=sidx,
            snd_gather_valid=svalid,
            band_plan=(
                try_band_plan(
                    edges.senders, edges.receivers, num_nodes,
                    # model.fused_chunk overrides the env-derived default
                    # (512 needs the raised scoped-VMEM limit; 256 always
                    # compiles) — bench.py's compile-failure fallback knob
                    chunk=self.params["model"].get("fused_chunk"),
                    latent_size=self.latent_size,
                    pb=int(self.params["model"].get("fused_pb", 1)),
                )
                if self.params["model"].get("agg_vjp") == "fused"
                else None
            ),
        )

    def topology_from_trajectory(self, trajectory: Dict[str, np.ndarray]) -> Topology:
        """Topology for a trajectory dict (num_nodes from node_type)."""
        return self.build_topology(
            trajectory["cells"][0],
            num_nodes=int(trajectory["node_type"].shape[1]),
        )

    def bucket_topology_extras(self, trajectories) -> Optional[dict]:
        """Bucket-level static dims for model-specific topology aux on the
        bucketed (variable-mesh) path — scanned once per dataset like
        data/bucketing.bucket_plan_dims.  None = the model has no extras."""
        return None

    def pad_topology_aux(
        self, trajectory: Dict[str, np.ndarray], num_nodes: int,
        extras: Optional[dict],
    ) -> Tuple[Optional[dict], Optional[int]]:
        """(aux, world_cap) for a bucketed topology (data/bucketing
        .pad_topology).  Default: no aux, no capacity."""
        return None, None

    def topology_content_key(self, trajectory: Dict[str, np.ndarray]) -> tuple:
        """Extra cache-key content for models whose topology depends on more
        than the mesh connectivity.  Mesh-only topologies return () — but a
        plate topology under ``max_world_edges: auto`` carries a capacity
        derived from the trajectory's MOTION, so same-mesh/different-motion
        trajectories must not share a cached topology (see PlateModel)."""
        return ()

    def forward(self, state: ModelState, graph: Graph) -> Array:
        return network_apply(state.params, graph, self.gnn_config)

    def inference_state(self, state: ModelState) -> ModelState:
        """State for inference/rollout, honoring ``model.inference_quant``.

        With ``inference_quant: int8`` every MLP weight is quantized to
        per-channel int8 (nn/quant.py) and the forward transparently runs
        W8A8 matmuls; anything else returns the state unchanged.
        """
        if self.params["model"].get("inference_quant") != "int8":
            return state
        from hyper_graph_nets_tpu.nn.quant import quantize_network

        return state.replace(params=quantize_network(state.params))

    # -- shared helpers ----------------------------------------------------
    def _normalize(
        self,
        state: ModelState,
        name: str,
        data: Array,
        accumulate: bool,
        mask: Optional[Array] = None,
    ) -> Tuple[Array, ModelState]:
        out, ns = norm.normalize(
            state.normalizers[name], data, accumulate_stats=accumulate, mask=mask
        )
        normalizers = dict(state.normalizers)
        normalizers[name] = ns
        return out, state.replace(normalizers=normalizers)

    def loss_mask(self, node_type: Array) -> Array:
        """Rows contributing to the loss; subclasses override (flag: NORMAL)."""
        return jnp.equal(node_type[..., 0], NodeType.NORMAL)

    # -- geometry / clustering hooks ---------------------------------------
    def geometry(self, frames) -> Tuple[Array, Array]:
        """(target_feature, mesh_features) — the world/mesh coordinate
        streams (reference MultiGraphWithPos fields, src/util.py:14-16)."""
        raise NotImplementedError

    def obstacle_mask_np(self, frame: Dict[str, np.ndarray]) -> Optional[np.ndarray]:
        """Nodes excluded from clustering (plate obstacles); None otherwise."""
        return None

    def world_edge_receiver_nodes(
        self, frame: Dict[str, np.ndarray], topo: Topology
    ) -> Optional[np.ndarray]:
        """Node indices receiving world edges in ``frame`` (host side).

        Used by the world-aware inter-cluster edge builder (reference
        hierarchical_connector.py:150-156); only models with world edges
        (plate) return indices.
        """
        return None

    def host_graph(self, frame: Dict[str, np.ndarray], topo: Topology):
        """Numpy snapshot of one frame for host-side clustering."""
        from hyper_graph_nets_tpu.rmp.clustering import HostGraph

        target, mesh = self.geometry({k: np.asarray(v) for k, v in frame.items()})
        target = np.asarray(target)
        mesh = np.asarray(mesh)
        snd, rcv = np.asarray(topo.senders), np.asarray(topo.receivers)
        if topo.mask is not None:
            valid = np.asarray(topo.mask) > 0
            snd, rcv = snd[valid], rcv[valid]
        rel_t = target[snd] - target[rcv]
        rel_m = mesh[snd] - mesh[rcv]
        tn = np.linalg.norm(rel_t, axis=-1, keepdims=True)
        ef = np.concatenate(
            [rel_t, tn, rel_m, np.linalg.norm(rel_m, axis=-1, keepdims=True)],
            axis=-1,
        )
        # raw max-min incident relative-world norm (monotone in the
        # normalized node_dynamic the reference sorts by, flag.py:101-116)
        dyn_max = np.full(topo.num_nodes, -np.inf)
        dyn_min = np.full(topo.num_nodes, np.inf)
        np.maximum.at(dyn_max, rcv, tn[:, 0])
        np.minimum.at(dyn_min, rcv, tn[:, 0])
        dyn = np.where(np.isfinite(dyn_max) & np.isfinite(dyn_min),
                       dyn_max - dyn_min, 0.0)
        obstacle = self.obstacle_mask_np(frame)
        # padded (bucketed) nodes are excluded from clustering like obstacles
        padded = np.asarray(frame["node_type"])[:, 0] < 0
        if padded.any():
            obstacle = padded if obstacle is None else (obstacle | padded)
        return HostGraph(
            target_feature=target,
            mesh_features=mesh,
            senders=snd,
            receivers=rcv,
            edge_features=ef,
            node_dynamic=dyn,
            obstacle_mask=obstacle,
            world_dim=target.shape[-1],
        )
